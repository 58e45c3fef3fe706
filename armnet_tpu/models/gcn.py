"""GCN over the field graph (Kipf 2017): default fully-connected adjacency,
symmetrically normalized each forward (spec: /root/reference/models/gcn.py)."""

import flax.linen as nn
import jax
import jax.numpy as jnp

from armnet_tpu.models.common import split_batch, squeeze_logits
from armnet_tpu.ops import initializers as init
from armnet_tpu.ops.layers import MLP, Embedding, normalize_adj


class GraphConvolution(nn.Module):
    noutfeat: int
    use_bias: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, adj, train: bool):
        ninfeat = x.shape[-1]
        weight = self.param("weight", init.xavier_uniform(),
                            (ninfeat, self.noutfeat))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        support = jnp.einsum("bfx,xy->bfy", x, weight)
        out = jnp.einsum("xy,bye->bxe", adj, support)
        if self.use_bias:
            out = out + self.param("bias", init.zeros, (self.noutfeat,))
        return out


class GCN(nn.Module):
    nfield: int
    nfeat: int
    nemb: int
    gcn_layers: int
    gcn_hid: int
    mlp_nlayer: int
    mlp_nhid: int
    dropout: float
    noutput: int = 1

    @nn.compact
    def __call__(self, batch, train: bool = False, adj=None):
        ids, values = split_batch(batch)
        h = Embedding(self.nfeat, self.nemb, name="embedding")(ids, values)
        if adj is None:
            adj = jnp.ones((self.nfield, self.nfield), h.dtype)
        adj = normalize_adj(adj)
        for l in range(self.gcn_layers):
            h = GraphConvolution(self.gcn_hid, dropout=self.dropout,
                                 name=f"gcn_{l}")(h, adj, train)
            h = jax.nn.relu(nn.Dropout(self.dropout,
                                       deterministic=not train)(h))
        flat = h.reshape(h.shape[0], -1)
        return squeeze_logits(
            MLP(self.mlp_nlayer, self.mlp_nhid, self.dropout, self.noutput,
                name="affine")(flat, train))
