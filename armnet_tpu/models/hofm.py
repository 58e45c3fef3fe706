"""Higher-Order FM (Blondel 2016): orders 2..k via order-sliced embeddings and
the ANOVA-kernel cumsum DP (spec: /root/reference/models/hofm.py)."""

import flax.linen as nn

from armnet_tpu.models.common import split_batch
from armnet_tpu.ops.interaction import anova_kernel
from armnet_tpu.ops.layers import Embedding, FeaturesLinear, fm_pool


class HOFM(nn.Module):
    nfeat: int
    nemb: int
    order: int

    @nn.compact
    def __call__(self, batch, train: bool = False):
        assert self.order >= 2, "invalid order"
        ids, values = split_batch(batch)
        # one embedding per order slice: [B, F, E*(order-1)]
        emb = Embedding(self.nfeat, self.nemb * (self.order - 1),
                        name="embedding")(ids, values)
        y = FeaturesLinear(self.nfeat, name="linear")(ids, values)
        y = y + fm_pool(emb[:, :, : self.nemb])
        for i in range(self.order - 2):
            sl = emb[:, :, (i + 1) * self.nemb: (i + 2) * self.nemb]
            y = y + anova_kernel(sl, order=i + 3)
        return y
