"""Attentional FM (Xiao 2017): softmax attention over all F(F-1)/2 hadamard
pairs (spec: /root/reference/models/afm.py)."""

import flax.linen as nn
import jax
import jax.numpy as jnp

from armnet_tpu.models.common import split_batch
from armnet_tpu.ops.layers import Embedding, FeaturesLinear, TorchLinear, triu_indices


class AttentionalInteraction(nn.Module):
    nattn: int
    dropout: float

    @nn.compact
    def __call__(self, x, train: bool):
        nfield = x.shape[1]
        vi, vj = triu_indices(nfield)
        had = x[:, vi] * x[:, vj]                              # [B, P, E]
        w = jax.nn.relu(TorchLinear(self.nattn, name="attn_w")(had))
        w = jax.nn.softmax(TorchLinear(1, name="attn_h")(w), axis=1)  # [B, P, 1]
        w = nn.Dropout(self.dropout, deterministic=not train)(w)
        afm = jnp.sum(w * had, axis=1)                         # [B, E]
        afm = nn.Dropout(self.dropout, deterministic=not train)(afm)
        return jnp.squeeze(TorchLinear(1, name="attn_p")(afm), -1)


class AFM(nn.Module):
    nfeat: int
    nemb: int
    nattn: int
    dropout: float

    @nn.compact
    def __call__(self, batch, train: bool = False):
        ids, values = split_batch(batch)
        emb = Embedding(self.nfeat, self.nemb, name="embedding")(ids, values)
        y = FeaturesLinear(self.nfeat, name="linear")(ids, values)
        return y + AttentionalInteraction(self.nattn, self.dropout,
                                          name="afm")(emb, train)
