"""Factorization Machine (Rendle 2010): linear + 2nd-order FM pooling
(spec: /root/reference/models/fm.py)."""

import flax.linen as nn

from armnet_tpu.models.common import split_batch
from armnet_tpu.ops.layers import Embedding, FeaturesLinear, fm_pool


class FM(nn.Module):
    nfeat: int
    nemb: int

    @nn.compact
    def __call__(self, batch, train: bool = False):
        ids, values = split_batch(batch)
        emb = Embedding(self.nfeat, self.nemb, name="embedding")(ids, values)
        return FeaturesLinear(self.nfeat, name="linear")(ids, values) + fm_pool(emb)
