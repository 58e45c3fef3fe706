"""ARM-Net (multi-head): adaptive relation modeling via entmax-sparse attention
selecting, per exponential neuron, a weighted field subset combined as
exp(sum w_f * e_f). Behavioral spec: /root/reference/models/armnet.py:8-101
(SIGMOD'21); re-designed as a functional flax module whose hot path runs
through armnet_tpu.ops.interaction / kernels.arm_pallas.
"""

import flax.linen as nn
import jax.numpy as jnp

from armnet_tpu.models.common import VALUE_CLAMP, DeepEnsemble, split_batch, squeeze_logits
from armnet_tpu.ops import initializers as init
from armnet_tpu.ops.entmax import sparse_normalizer
from armnet_tpu.ops.interaction import arm_attention_multihead, arm_exp_cross_fmajor
from armnet_tpu.ops.layers import MLP, BatchNorm, Embedding


class SparseAttLayer(nn.Module):
    """Multi-head sparse attention producing per-(head, neuron) signed
    field-weight vectors in the TPU-friendly fields-major layout [B, F, K*O]
    (math parity with the reference's [B,K,O,F]; the K*O channel axis stays
    lane-minor end-to-end — see ops.interaction.arm_attention_multihead).
    Params (all xavier gain 1.414): bilinear_w [K,E,dk], query [K,O,dk],
    values [K,O,F]."""

    nhead: int
    nfield: int
    nemb: int
    d_k: int
    nhid: int
    alpha: float = 1.5

    @nn.compact
    def __call__(self, x):
        bilinear_w = self.param(
            "bilinear_w", init.xavier_uniform(1.414),
            (self.nhead, self.nemb, self.d_k))
        query = self.param(
            "query", init.xavier_uniform(1.414), (self.nhead, self.nhid, self.d_k))
        values = self.param(
            "values", init.xavier_uniform(1.414), (self.nhead, self.nhid, self.nfield))
        normalizer = sparse_normalizer(self.alpha, axis=1)  # over fields
        return arm_attention_multihead(x, bilinear_w, query, values, normalizer)


class ARMNet(nn.Module):
    """Adaptive Relation Modeling Network (multi-head).

    Key hyperparams: alpha (sparsity), nhead (attention heads),
    nhid (exponential neurons)."""

    nfield: int
    nfeat: int
    nemb: int
    nhead: int
    alpha: float
    nhid: int
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
        arm_weight = SparseAttLayer(
            self.nhead, self.nfield, self.nemb, self.nemb, self.nhid,
            self.alpha, name="attn_layer")(emb)                 # [B,F,K*O]
        x = arm_exp_cross_fmajor(emb, arm_weight)               # [B,K*O,E]
        x = BatchNorm(channel_axis=1, name="arm_bn")(x, train)  # per (k,o) channel
        x = x.reshape(x.shape[0], -1)

        y = MLP(self.mlp_nlayer, self.mlp_nhid, self.dropout,
                self.noutput, name="mlp")(x, train)
        if self.ensemble:
            y = DeepEnsemble(self.nfeat, self.nemb,
                             self.deep_nlayer, self.deep_nhid, self.dropout,
                             self.noutput, name="ensemble")(y, ids, values, train)
        return squeeze_logits(y)
