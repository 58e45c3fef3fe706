"""DeepFM (Guo 2017): linear + FM + flatten-MLP with a shared embedding
(spec: /root/reference/models/dfm.py)."""

import flax.linen as nn

from armnet_tpu.models.common import add_first_order, split_batch, squeeze_logits
from armnet_tpu.ops.layers import MLP, Embedding, FeaturesLinear, fm_pool


class DeepFM(nn.Module):
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
        flat = emb.reshape(emb.shape[0], -1)
        y = FeaturesLinear(self.nfeat, name="linear")(ids, values) + fm_pool(emb)
        return add_first_order(y, squeeze_logits(
            MLP(self.mlp_nlayer, self.mlp_nhid, self.dropout, self.noutput,
                name="mlp")(flat, train)))
