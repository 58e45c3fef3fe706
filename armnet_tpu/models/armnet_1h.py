"""ARM-Net one-head (the README-recommended flagship): shared bilinear weight
(a bias-free E->d_k projection) instead of per-head bilinear tensors.
Behavioral spec: /root/reference/models/armnet_1h.py:8-98.
"""

import flax.linen as nn
import jax.numpy as jnp

from armnet_tpu.models.common import VALUE_CLAMP, DeepEnsemble, split_batch, squeeze_logits
from armnet_tpu.ops import initializers as init
from armnet_tpu.ops.entmax import sparse_normalizer
from armnet_tpu.ops.interaction import arm_attention_1h, arm_exp_cross
from armnet_tpu.ops.layers import MLP, BatchNorm, Embedding, TorchLinear


class SparseAttention(nn.Module):
    """One-head sparse attention: keys = W x (shared bilinear), gates scored
    against a [O, d_k] query, entmax over fields, scaled by [O, F] values."""

    nfield: int
    d_k: int
    nhid: int
    nemb: int
    alpha: float = 1.5

    @nn.compact
    def __call__(self, x):
        keys = TorchLinear(self.d_k, use_bias=False, name="bilinear_w")(x)
        query = self.param(
            "query", init.xavier_uniform(1.414), (self.nhid, self.d_k))
        values = self.param(
            "values", init.xavier_uniform(1.414), (self.nhid, self.nfield))
        normalizer = sparse_normalizer(self.alpha)
        return arm_attention_1h(keys, query, values, normalizer)   # [B,O,F]


class ARMNet1H(nn.Module):
    """Adaptive Relation Modeling Network w/ shared bilinear weight (one-head)."""

    nfield: int
    nfeat: int
    nemb: int
    alpha: float
    nhid: int
    d_k: int
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
        arm_weight = SparseAttention(
            self.nfield, self.d_k, self.nhid, self.nemb, self.alpha,
            name="attn_layer")(emb)                              # [B,O,F]
        x = arm_exp_cross(emb, arm_weight)                       # [B,O,E]
        x = BatchNorm(channel_axis=1, name="arm_bn")(x, train)   # per-neuron
        x = x.reshape(x.shape[0], -1)

        y = MLP(self.mlp_nlayer, self.mlp_nhid, self.dropout,
                self.noutput, name="mlp")(x, train)
        if self.ensemble:
            y = DeepEnsemble(self.nfeat, self.nemb, self.nfield,
                             self.deep_nlayer, self.deep_nhid, self.dropout,
                             self.noutput, name="ensemble")(y, ids, values, train)
        return squeeze_logits(y)
