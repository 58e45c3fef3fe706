"""Product-based NNs (Qu 2016): IPNN (inner products of triu pairs) and KPNN
(learned bilinear kernel per pair), concatenated with the flat embedding into
an MLP (spec: /root/reference/models/pnn.py)."""

import flax.linen as nn
import jax.numpy as jnp

from armnet_tpu.models.common import split_batch, squeeze_logits
from armnet_tpu.ops import initializers as init
from armnet_tpu.ops.layers import MLP, Embedding, triu_indices


class IPNN(nn.Module):
    nfield: int
    nfeat: int
    nemb: int
    mlp_nlayer: int
    mlp_nhid: int
    dropout: float
    noutput: int = 1

    @nn.compact
    def __call__(self, batch, train: bool = False):
        ids, values = split_batch(batch)
        emb = Embedding(self.nfeat, self.nemb, name="embedding")(ids, values)
        vi, vj = triu_indices(self.nfield)
        prod = jnp.sum(emb[:, vi] * emb[:, vj], axis=-1)         # [B, P]
        x = jnp.concatenate([emb.reshape(emb.shape[0], -1), prod], axis=1)
        return squeeze_logits(
            MLP(self.mlp_nlayer, self.mlp_nhid, self.dropout, self.noutput,
                name="mlp")(x, train))


class KPNN(nn.Module):
    nfield: int
    nfeat: int
    nemb: int
    mlp_nlayer: int
    mlp_nhid: int
    dropout: float
    noutput: int = 1

    @nn.compact
    def __call__(self, batch, train: bool = False):
        ids, values = split_batch(batch)
        emb = Embedding(self.nfeat, self.nemb, name="embedding")(ids, values)
        vi, vj = triu_indices(self.nfield)
        npair = len(vi)
        kernel = self.param("kernel", init.xavier_uniform(),
                            (self.nemb, npair, self.nemb))
        prod = jnp.einsum("bki,ikj,bkj->bk", emb[:, vi], kernel, emb[:, vj])
        x = jnp.concatenate([emb.reshape(emb.shape[0], -1), prod], axis=1)
        return squeeze_logits(
            MLP(self.mlp_nlayer, self.mlp_nhid, self.dropout, self.noutput,
                name="mlp")(x, train))
