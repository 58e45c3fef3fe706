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
from armnet_tpu.ops.interaction import mh_gate_proj
from armnet_tpu.ops.layers import MLP, BatchNorm, Embedding


class GCSparseAttLayer(nn.Module):
    """Sparse attention with global context, in the fields-major [B, F, K*O]
    layout (math parity with the reference's [B,K,O,F] gates at
    /root/reference/models/gc_arm.py:20-37; the bilinear+query factors fold
    into one [K*O, E] projection so the K*O channel axis stays lane-minor —
    see ops.interaction.mh_gate_proj). Note: no d_k^-0.5 scale here
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

        m = mh_gate_proj(bilinear, query)                             # [K*O, E]
        gates = jnp.einsum("bfx,ox->bfo", x, m)                       # [B,F,K*O]
        context = jnp.sum(x, axis=1)                                  # [B,E]
        gctx = jnp.einsum("bx,ox->bo", context, m)                    # [B,K*O]
        gates = gates + gctx[:, None, :]

        sparse = sparse_normalizer(self.alpha, axis=1)(gates)         # over fields
        v_t = values.reshape(self.nhead * self.nhid, self.nfield).T   # [F, K*O]
        return sparse * v_t[None]                                     # [B,F,K*O]


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
            name="attn_layers")(emb)                                  # [B,F,K*O]

        arm = jnp.einsum("bfe,bfc->bce", x_exp, arm_weights)          # [B,K*O,E]
        arm = BatchNorm(channel_axis=1, name="arm_bn")(arm, train)
        arm = arm.reshape(arm.shape[0], -1)

        y = MLP(self.mlp_nlayer, self.mlp_nhid, self.dropout,
                self.noutput, name="mlp")(arm, train)
        if self.ensemble:
            y = DeepEnsemble(self.nfeat, self.nemb,
                             self.deep_nlayer, self.deep_nhid, self.dropout,
                             self.noutput, name="ensemble")(y, ids, values, train)
        return squeeze_logits(y)
