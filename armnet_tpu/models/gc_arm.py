"""GC-ARM: ARM with global-context attention — the field-sum embedding is
pushed through the same bilinear+query path as a per-(head, neuron) scalar
bias on the gates; the interaction applies exp(emb) BEFORE weighting (a plain
weighted sum of exponentiated embeddings), unlike ARM-Net's exp-after-sum.
Behavioral spec: /root/reference/models/gc_arm.py:6-105.
"""

import flax.linen as nn
import jax.numpy as jnp

from armnet_tpu.models.common import VALUE_CLAMP, DeepEnsemble, split_batch, squeeze_logits
from armnet_tpu.ops import initializers as init
from armnet_tpu.ops.entmax import sparse_normalizer
from armnet_tpu.ops.layers import MLP, BatchNorm, Embedding


class GCSparseAttLayer(nn.Module):
    """Sparse attention with global context. Note: no d_k^-0.5 scale here
    (parity with the reference gc_arm gates)."""

    nhead: int
    nfield: int
    nemb: int
    nhid: int
    alpha: float = 1.5

    @nn.compact
    def __call__(self, x):
        query = self.param(
            "query", init.xavier_uniform(1.414), (self.nhead, self.nhid, self.nemb))
        bilinear = self.param(
            "bilinear", init.xavier_uniform(1.414), (self.nhead, self.nemb, self.nemb))
        values = self.param(
            "values", init.xavier_uniform(1.414), (self.nhead, self.nhid, self.nfield))

        gates = jnp.einsum("bfx,kxy,koy->bkof", x, bilinear, query)   # [B,K,O,F]
        context = jnp.sum(x, axis=1)                                  # [B,E]
        gctx = jnp.einsum("bx,kxy,koy->bko", context, bilinear, query)
        gates = gates + gctx[..., None]

        sparse = sparse_normalizer(self.alpha)(gates)
        return sparse * values[None]                                  # [B,K,O,F]


class GCARM(nn.Module):
    """ARM + global context (context-aware self-attention)."""

    nfield: int
    nfeat: int
    nemb: int
    nhead: int
    alpha: float
    arm_hid: int
    mlp_nlayer: int
    mlp_nhid: int
    dropout: float
    ensemble: bool
    deep_nlayer: int
    deep_nhid: int
    noutput: int = 1

    @nn.compact
    def __call__(self, batch, train: bool = False):
        ids, values = split_batch(batch)
        values = jnp.clip(values, *VALUE_CLAMP)

        emb = Embedding(self.nfeat, self.nemb, name="embedding")(ids, values)
        # exp-before-weighting, batch-normalized per field channel
        x_exp = BatchNorm(channel_axis=1, name="emb_bn")(jnp.exp(emb), train)
        arm_weights = GCSparseAttLayer(
            self.nhead, self.nfield, self.nemb, self.arm_hid, self.alpha,
            name="attn_layers")(emb)                                  # [B,K,O,F]

        arm = jnp.einsum("bfe,bkof->bkoe", x_exp, arm_weights)
        arm = arm.reshape(arm.shape[0], self.nhead * self.arm_hid, self.nemb)
        arm = BatchNorm(channel_axis=1, name="arm_bn")(arm, train)
        arm = arm.reshape(arm.shape[0], -1)

        y = MLP(self.mlp_nlayer, self.mlp_nhid, self.dropout,
                self.noutput, name="mlp")(arm, train)
        if self.ensemble:
            y = DeepEnsemble(self.nfeat, self.nemb, self.nfield,
                             self.deep_nlayer, self.deep_nhid, self.dropout,
                             self.noutput, name="ensemble")(y, ids, values, train)
        return squeeze_logits(y)
