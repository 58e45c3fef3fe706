"""Logistic regression: first-order term only (spec: /root/reference/models/lr.py)."""

import flax.linen as nn

from armnet_tpu.models.common import split_batch
from armnet_tpu.ops.layers import FeaturesLinear


class LR(nn.Module):
    nfeat: int

    @nn.compact
    def __call__(self, batch, train: bool = False):
        ids, values = split_batch(batch)
        return FeaturesLinear(self.nfeat, name="linear")(ids, values)
