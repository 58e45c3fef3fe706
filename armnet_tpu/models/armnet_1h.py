"""ARM-Net one-head (the README-recommended flagship): shared bilinear weight
(a bias-free E->d_k projection) instead of per-head bilinear tensors.
Behavioral spec: /root/reference/models/armnet_1h.py:8-98.
"""

import flax.linen as nn
import jax.numpy as jnp

from armnet_tpu.models.common import VALUE_CLAMP, DeepEnsemble, split_batch, squeeze_logits
from armnet_tpu.ops import initializers as init
from armnet_tpu.ops.interaction import arm1h_interaction
from armnet_tpu.ops.layers import MLP, BatchNorm, Embedding


class SparseAttention(nn.Module):
    """One-head sparse interaction: keys = W x (shared bilinear), gates scored
    against a [O, d_k] query, entmax over fields, scaled by [O, F] values,
    exponential-neuron cross product. Returns [B, O, E] (the attention and
    the exp-cross are one fused op so the Pallas backend can keep the [B,O,F]
    intermediates VMEM-resident)."""

    nfield: int
    d_k: int
    nhid: int
    nemb: int
    alpha: float = 1.5

    @nn.compact
    def __call__(self, x):
        # raw [E, d_k] kernel (torch nn.Linear default init; the reference's
        # bias-free bilinear_w, armnet_1h.py:16)
        wk = self.param("bilinear_w",
                        init.torch_linear_uniform(self.nemb),
                        (self.nemb, self.d_k))
        query = self.param(
            "query", init.xavier_uniform(1.414), (self.nhid, self.d_k))
        values = self.param(
            "values", init.xavier_uniform(1.414), (self.nhid, self.nfield))
        return arm1h_interaction(x, wk, query, values, self.alpha)  # [B,O,E]


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
        x = SparseAttention(
            self.nfield, self.d_k, self.nhid, self.nemb, self.alpha,
            name="attn_layer")(emb)                              # [B,O,E]
        x = BatchNorm(channel_axis=1, name="arm_bn")(x, train)   # per-neuron
        x = x.reshape(x.shape[0], -1)

        y = MLP(self.mlp_nlayer, self.mlp_nhid, self.dropout,
                self.noutput, name="mlp")(x, train)
        if self.ensemble:
            y = DeepEnsemble(self.nfeat, self.nemb,
                             self.deep_nlayer, self.deep_nhid, self.dropout,
                             self.noutput, name="ensemble")(y, ids, values, train)
        return squeeze_logits(y)
