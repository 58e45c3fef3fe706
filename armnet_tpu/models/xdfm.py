"""CIN / xDeepFM (Lian 2018): compressed interaction network — outer products
over field dims compressed by 1x1 filters per layer, sum-pooled and affinely
combined (spec: /root/reference/models/xdfm.py). The 1x1 Conv1d is expressed
as a batched einsum so the MXU executes it directly."""

import flax.linen as nn
import jax.numpy as jnp

from armnet_tpu.models.common import add_first_order, split_batch, squeeze_logits
from armnet_tpu.ops import initializers as init
from armnet_tpu.ops.interaction import compressed_interaction_step
from armnet_tpu.ops.layers import MLP, Embedding, FeaturesLinear, TorchLinear


class CompressedInteraction(nn.Module):
    nfield: int
    nlayers: int
    nfilter: int

    @nn.compact
    def __call__(self, x):
        pooled = []
        xk = x
        n_prev = self.nfield
        for k in range(self.nlayers):
            # torch Conv1d(F*C -> nfilter, ks=1, no bias) == dense over channels
            filt = self.param(
                f"filter_{k}", init.torch_linear_uniform(self.nfield * n_prev),
                (self.nfield * n_prev, self.nfilter))
            xk = compressed_interaction_step(x, xk, filt)      # [B, nfilter, E]
            pooled.append(jnp.sum(xk, axis=-1))                # [B, nfilter]
            n_prev = self.nfilter
        y = TorchLinear(1, use_bias=False, name="affine")(
            jnp.concatenate(pooled, axis=1))
        return jnp.squeeze(y, -1)


class CIN(nn.Module):
    """CIN without the deep tower (registry name `cin`)."""

    nfield: int
    nfeat: int
    nemb: int
    cin_layers: int
    nfilter: int

    @nn.compact
    def __call__(self, batch, train: bool = False):
        ids, values = split_batch(batch)
        emb = Embedding(self.nfeat, self.nemb, name="embedding")(ids, values)
        y = FeaturesLinear(self.nfeat, name="linear")(ids, values)
        return y + CompressedInteraction(self.nfield, self.cin_layers,
                                         self.nfilter, name="cin")(emb)


class XDeepFM(nn.Module):
    """xDeepFM: linear + CIN + MLP sum (registry name `xdfm`)."""

    nfield: int
    nfeat: int
    nemb: int
    cin_layers: int
    nfilter: int
    mlp_nlayer: int
    mlp_nhid: int
    dropout: float
    noutput: int = 1

    @nn.compact
    def __call__(self, batch, train: bool = False):
        ids, values = split_batch(batch)
        emb = Embedding(self.nfeat, self.nemb, name="embedding")(ids, values)
        y = FeaturesLinear(self.nfeat, name="linear")(ids, values)
        y = y + CompressedInteraction(self.nfield, self.cin_layers,
                                      self.nfilter, name="cin")(emb)
        flat = emb.reshape(emb.shape[0], -1)
        return add_first_order(y, squeeze_logits(
            MLP(self.mlp_nlayer, self.mlp_nhid, self.dropout, self.noutput,
                name="mlp")(flat, train)))
