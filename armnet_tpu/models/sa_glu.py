"""SA-GLU (Dauphin 2017 GLU over two self-attention branches):
(attn_w(x)+b_w) * sigmoid(attn_v(x)+b_v) -> MLP; optional DNN ensemble
(spec: /root/reference/models/sa_glu.py; its emb_bn is declared but unused in
the reference forward, so we don't create it)."""

import flax.linen as nn
import jax
import jax.numpy as jnp

from armnet_tpu.models.common import VALUE_CLAMP, DeepEnsemble, split_batch, squeeze_logits
from armnet_tpu.ops import initializers as init
from armnet_tpu.ops.layers import MLP, Embedding, SelfAttnLayer


class SAGLU(nn.Module):
    nfield: int
    nfeat: int
    nemb: int
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

        w_b = self.param("w_b", init.zeros, (self.nemb,))
        v_b = self.param("v_b", init.zeros, (self.nemb,))
        xw = SelfAttnLayer(self.nemb, name="self_attn_w")(emb)[0] + w_b
        xv = SelfAttnLayer(self.nemb, name="self_attn_v")(emb)[0] + v_b
        glu = xw * jax.nn.sigmoid(xv)                             # [B,F,E]

        glu = nn.Dropout(self.dropout, deterministic=not train)(
            glu.reshape(glu.shape[0], -1))
        y = MLP(self.mlp_nlayer, self.mlp_nhid, self.dropout, self.noutput,
                name="mlp")(glu, train)
        if self.ensemble:
            y = DeepEnsemble(self.nfeat, self.nemb,
                             self.deep_nlayer, self.deep_nhid, self.dropout,
                             self.noutput, name="ensemble")(y, ids, values, train)
        return squeeze_logits(y)
