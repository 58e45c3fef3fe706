"""Deep & Cross Network (Wang 2017): k layers of x0*(w^T x) + b + x, without
(`dcn`) and with (`dcn+`) a parallel MLP (spec: /root/reference/models/dcn.py)."""

import flax.linen as nn
import jax.numpy as jnp

from armnet_tpu.models.common import split_batch, squeeze_logits
from armnet_tpu.ops import initializers as init
from armnet_tpu.ops.interaction import cross_layer
from armnet_tpu.ops.layers import MLP, Embedding, TorchLinear


class CrossNetwork(nn.Module):
    nlayers: int

    @nn.compact
    def __call__(self, x):
        ninput = x.shape[-1]
        x0 = x
        for l in range(self.nlayers):
            w = self.param(f"w_{l}", init.torch_linear_uniform(ninput), (ninput, 1))
            b = self.param(f"b_{l}", init.zeros, (ninput,))
            x = cross_layer(x0, x, w, b)
        return x


class CrossNet(nn.Module):
    """DCN without the deep tower (registry name `dcn`)."""

    nfield: int
    nfeat: int
    nemb: int
    cn_layers: int

    @nn.compact
    def __call__(self, batch, train: bool = False):
        ids, values = split_batch(batch)
        emb = Embedding(self.nfeat, self.nemb, name="embedding")(ids, values)
        x = emb.reshape(emb.shape[0], -1)
        xl = CrossNetwork(self.cn_layers, name="cross_net")(x)
        y = TorchLinear(1, use_bias=False, name="w")(xl)
        return squeeze_logits(y)


class DCN(nn.Module):
    """DCN with a deep tower (registry name `dcn+`): cross || MLP -> linear.
    Parity detail: the MLP's final layer outputs mlp_nhid (not 1) before the
    concat projection (reference dcn.py:62)."""

    nfield: int
    nfeat: int
    nemb: int
    cn_layers: int
    mlp_nlayer: int
    mlp_nhid: int
    dropout: float
    noutput: int = 1

    @nn.compact
    def __call__(self, batch, train: bool = False):
        ids, values = split_batch(batch)
        emb = Embedding(self.nfeat, self.nemb, name="embedding")(ids, values)
        x = emb.reshape(emb.shape[0], -1)
        xl = CrossNetwork(self.cn_layers, name="cross_net")(x)
        hl = MLP(self.mlp_nlayer, self.mlp_nhid, self.dropout,
                 noutput=self.mlp_nhid, name="mlp")(x, train)
        y = TorchLinear(self.noutput, use_bias=False, name="w")(
            jnp.concatenate([xl, hl], axis=1))
        return squeeze_logits(y)
