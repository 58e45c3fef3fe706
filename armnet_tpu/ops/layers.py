"""Shared layer library (flax.linen) — the op substrate of the model zoo.

Re-designed from the behavioral spec of the reference's shared layers
(/root/reference/models/layers.py:8-182) as functional JAX modules:

  Embedding            value-scaled embedding-bag            (layers.py:8-21)
  FeaturesLinear       first-order term over fields          (layers.py:24-37)
  fm_pool              0.5*((sum e)^2 - sum e^2) FM pooling  (layers.py:40-55)
  MLP                  [Linear->BN->ReLU->Dropout]*L -> Linear (layers.py:68-88)
  SelfAttnLayer        per-field QKV softmax attention       (layers.py:100-117)
  MultiHeadAttention   residual + LayerNorm MHA              (layers.py:141-182)
  triu_indices / all_pair_indices / normalize_adj helpers

Torch-semantics notes baked in:
  * BatchNorm: eps 1e-5, torch momentum 0.1 == flax momentum 0.9; on a 3-D
    [B, C, L] input torch normalizes per channel C over (B, L) -> flax axis=1.
  * nn.Linear default init == U(±1/sqrt(fan_in)) on weight AND bias.
"""

import math
import threading
from contextlib import contextmanager
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from armnet_tpu.ops import initializers as init
from armnet_tpu.ops.embedding import scaled_embedding_lookup

__all__ = [
    "Embedding", "FeaturesLinear", "fm_pool", "MLP", "BatchNorm",
    "SelfAttnLayer", "MultiHeadAttention", "triu_indices", "all_pair_indices",
    "normalize_adj", "TorchLinear", "batch_mask_scope",
]

# trace-time batch-mask context (same pattern as the sharded-lookup context,
# ops/embedding.py): the train step enters this scope around the model apply
# so BatchNorm can compute MASKED batch statistics. Why: XLA needs static
# shapes, so the loader pads the final partial batch to B with mask-0 rows
# (data/libsvm.py:305-322) — the torch reference's last batch is genuinely
# SMALL, so its BN statistics see only real rows. Unmasked stats over the
# padded batch are polluted by the pad rows (r5 audit: AFN's value-clamp
# turns a pad row into log(W*1e-3), a -6.9 outlier per element; with a ~40%
# padded last batch the emb_bn running mean absorbed it every epoch at
# momentum 0.1, and valid AUC DECAYED while batch-stats eval kept climbing
# — running=0.9147 vs batchstats=0.9377 at epoch 7, /tmp probe, BENCH_NOTES
# r5). Masked stats restore exact parity for real rows.
_batch_mask = threading.local()


@contextmanager
def batch_mask_scope(mask):
    """Expose the batch validity mask [B] to BatchNorm during an apply."""
    prev = getattr(_batch_mask, "value", None)
    _batch_mask.value = mask
    try:
        yield
    finally:
        _batch_mask.value = prev


def current_batch_mask():
    return getattr(_batch_mask, "value", None)


def triu_indices(n, diag_offset=1):
    """(i, j) index arrays for the strict upper triangle of an (n, n) grid."""
    return np.triu_indices(n, diag_offset)


def all_pair_indices(n):
    """(i, j) index arrays for all n^2 ordered pairs."""
    idx = np.arange(n)
    return np.repeat(idx, n), np.tile(idx, n)


def normalize_adj(adj):
    """Symmetric degree normalization D^-1/2 A D^-1/2 (torch variant parity:
    /root/reference/models/gcn.py:6-12 — A@D^-1/2, transpose, @D^-1/2)."""
    rowsum = jnp.sum(adj, axis=-1)
    d_inv_sqrt = jnp.where(rowsum > 0, jax.lax.rsqrt(jnp.maximum(rowsum, 1e-12)), 0.0)
    return (adj * d_inv_sqrt[None, :]).T * d_inv_sqrt[None, :]


class TorchLinear(nn.Module):
    """Dense layer with torch.nn.Linear's default initialization."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", init.torch_linear_uniform(fan_in), (fan_in, self.features)
        )
        y = jnp.matmul(x, kernel.astype(x.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", init.torch_linear_uniform(fan_in), (self.features,)
            )
            y = y + bias.astype(x.dtype)
        return y


class _TorchBN(nn.Module):
    """torch-exact BatchNorm core. One semantic difference from
    flax.linen.BatchNorm forced this reimplementation: torch updates
    running_var with the UNBIASED batch variance (x n/(n-1),
    functional.py batch_norm) while flax stores the biased estimate —
    train-mode forwards agree (both normalize by the biased var) but
    eval-mode logits drift apart, caught by
    test_afn_trajectory_matches_reference at batch 64 (r5). Param/stat
    names match flax's ('scale'/'bias', 'mean'/'var') so checkpoints and
    transplant maps are unchanged."""

    channel_axis: int
    momentum: float = 0.9          # torch momentum 0.1 == keep 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        ch = self.channel_axis % x.ndim
        red = tuple(i for i in range(x.ndim) if i != ch)
        shape = (x.shape[ch],)
        bshape = tuple(x.shape[ch] if i == ch else 1 for i in range(x.ndim))
        scale = self.param("scale", init.ones, shape)
        bias = self.param("bias", init.zeros, shape)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), shape)
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), shape)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            mask = current_batch_mask()
            if mask is not None and (ch == 0
                                     or mask.shape[0] != x.shape[0]):
                # fail loudly rather than silently fall back to pad-polluted
                # statistics: every BN in the zoo is batch-led (audited r5),
                # so a mismatch means a new call site broke the contract
                raise ValueError(
                    f"batch_mask_scope active (mask {mask.shape}) but this "
                    f"BatchNorm input {x.shape} (channel axis {ch}) is not "
                    f"batch-led; masked statistics cannot be applied")
            if mask is not None:
                # masked statistics: the loader pads the final partial batch
                # with mask-0 rows (static shapes for XLA); the torch
                # reference's last batch is genuinely small, so parity
                # demands the pad rows contribute NOTHING to batch stats
                # (see batch_mask_scope above). n is the real element count
                # (dynamic scalar — fine under jit).
                spatial = 1
                for i in red:
                    if i != 0:
                        spatial *= x.shape[i]
                w = mask.astype(xf.dtype).reshape(
                    (x.shape[0],) + (1,) * (x.ndim - 1))
                n = jnp.maximum(jnp.sum(mask.astype(xf.dtype)), 1) * spatial
                mean = jnp.sum(xf * w, red) / n
                var = jnp.sum(jnp.square(xf - mean.reshape(bshape)) * w,
                              red) / n
            else:
                n = 1
                for i in red:
                    n *= x.shape[i]
                mean = jnp.mean(xf, red)
                var = jnp.mean(jnp.square(xf - mean.reshape(bshape)), red)
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1, 1))
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * unbiased)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x - mean.reshape(bshape).astype(x.dtype)) \
            * inv.reshape(bshape).astype(x.dtype) \
            + bias.reshape(bshape).astype(x.dtype)
        return y


class BatchNorm(nn.Module):
    """BatchNorm with torch defaults. `channel_axis` is the torch channel dim
    (normalize over every other axis). Inner module keeps the historical
    'BatchNorm_0' tree name."""

    channel_axis: int = -1

    @nn.compact
    def __call__(self, x, train: bool):
        return _TorchBN(self.channel_axis, name="BatchNorm_0")(
            x, use_running_average=not train)


class Embedding(nn.Module):
    """Value-scaled embedding-bag over (field-id, value) records -> [B, F, E].

    Large (gather-path) tables are stored FLAT [nfeat*nemb]: a [R, 10] f32
    param lives in a T(8,128) layout whose 12.8x lane padding every
    full-table pass pays (Adam on the Criteo table: 11 ms/step measured);
    the flat vector is unpadded. Tiny tables keep 2-D for the one-hot MXU
    path."""

    nfeat: int
    nemb: int

    @nn.compact
    def __call__(self, ids, values):
        from armnet_tpu.ops.embedding import ONE_HOT_MAX_ROWS

        if self.nfeat > ONE_HOT_MAX_ROWS:
            table = self.param(
                "embedding", init.xavier_uniform_flat(self.nfeat, self.nemb),
                (self.nfeat * self.nemb,))
        else:
            table = self.param(
                "embedding", init.xavier_uniform(), (self.nfeat, self.nemb))
        from armnet_tpu.kernels.config import compute_dtype

        emb = scaled_embedding_lookup(table, ids, values, nemb=self.nemb)
        return emb.astype(compute_dtype())


class FeaturesLinear(nn.Module):
    """First-order term: per-feature scalar weight * value, summed over fields.

    Large weights are stored FLAT [nfeat] like Embedding's tables: a
    [nfeat, 1] f32 param lives in a T(8,128) layout that pads the width-1
    minor dim to 128 lanes — a 128x physical blowup every full-weight pass
    (Adam) pays at Criteo scale (~1 GB of phantom HBM across weight +
    m/v state)."""

    nfeat: int

    @nn.compact
    def __call__(self, ids, values):
        from armnet_tpu.ops.embedding import ONE_HOT_MAX_ROWS

        bias = self.param("bias", init.zeros, (1,))
        # init parity: the reference's Linear wraps nn.Embedding(nfeat, 1)
        # and never re-inits it (models/layers.py:27), so the first-order
        # weight starts N(0, 1) — NOT xavier like the embedding tables
        # (xavier's sqrt(6/nfeat) bound would start the linear term ~1000x
        # smaller at Criteo scale and diverge the early training curve).
        # Routed through the embedding-bag dispatcher so the weight follows
        # the same row-sharded collective path as the tables.
        if self.nfeat > ONE_HOT_MAX_ROWS:
            weight = self.param("weight", init.normal_unit(), (self.nfeat,))
            w = scaled_embedding_lookup(weight, ids, values, nemb=1)
        else:
            weight = self.param("weight", init.normal_unit(),
                                (self.nfeat, 1))
            w = scaled_embedding_lookup(weight, ids, values)    # [B, F, 1]
        return jnp.sum(w[..., 0], axis=1) + bias[0]             # [B]


def fm_pool(x, reduce_dim=True):
    """FM second-order pooling over the field axis of [B, F, E]."""
    square_of_sum = jnp.square(jnp.sum(x, axis=1))              # [B, E]
    sum_of_square = jnp.sum(jnp.square(x), axis=1)              # [B, E]
    fm = square_of_sum - sum_of_square
    if reduce_dim:
        fm = jnp.sum(fm, axis=1)                                # [B]
    return 0.5 * fm


class MLP(nn.Module):
    """nlayers x [Linear -> BatchNorm -> ReLU -> Dropout] -> Linear(noutput).

    nlayers == 0 degenerates to a single Linear (reference layers.py:79)."""

    nlayers: int
    nhid: int
    dropout: float = 0.0
    noutput: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(self.nlayers):
            x = TorchLinear(self.nhid)(x)
            x = BatchNorm(channel_axis=-1)(x, train)
            x = nn.relu(x)
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return TorchLinear(self.noutput)(x)


class SelfAttnLayer(nn.Module):
    """Scaled dot-product self-attention over fields (used by SA-GLU)."""

    nemb: int

    @nn.compact
    def __call__(self, x):
        q = TorchLinear(self.nemb, use_bias=False)(x)           # [B, F, E]
        k = TorchLinear(self.nemb, use_bias=False)(x)
        v = TorchLinear(self.nemb, use_bias=False)(x)
        scores = jnp.einsum("bxe,bye->bxy", q, k) / math.sqrt(self.nemb)
        attn = jax.nn.softmax(scores, axis=-1)                  # [B, F, F]
        return jnp.einsum("bxy,bye->bxe", attn, v), attn


class MultiHeadAttention(nn.Module):
    """Multi-head attention with residual + LayerNorm (reference parity for
    layers.py:141-182; unused by the zoo but part of the public layer API)."""

    nhead: int
    n_k: int
    n_v: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        bsz, seq_len, ninput = x.shape
        q = TorchLinear(self.nhead * self.n_k, use_bias=False)(x)
        k = TorchLinear(self.nhead * self.n_k, use_bias=False)(x)
        v = TorchLinear(self.nhead * self.n_v, use_bias=False)(x)
        q = q.reshape(bsz, seq_len, self.nhead, self.n_k).transpose(0, 2, 1, 3)
        k = k.reshape(bsz, seq_len, self.nhead, self.n_k).transpose(0, 2, 1, 3)
        v = v.reshape(bsz, seq_len, self.nhead, self.n_v).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhxe,bhye->bhxy", q / math.sqrt(self.n_k), k)
        if mask is not None:
            attn = jnp.where(mask[:, None] == 0, -1e9, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(rate=0.0, deterministic=not train)(attn)
        y = jnp.einsum("bhxy,bhye->bhxe", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(bsz, seq_len, -1)
        y = TorchLinear(ninput, use_bias=False)(y)
        y = nn.Dropout(rate=self.dropout, deterministic=not train)(y)
        y = y + x
        y = nn.LayerNorm(epsilon=1e-6)(y)
        return y, attn
