"""Neural FM (He & Chua 2017): vector FM pooling -> BN -> dropout -> MLP,
plus the linear term (spec: /root/reference/models/nfm.py)."""

import flax.linen as nn

from armnet_tpu.models.common import add_first_order, split_batch, squeeze_logits
from armnet_tpu.ops.layers import MLP, BatchNorm, Embedding, FeaturesLinear, fm_pool


class NFM(nn.Module):
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
        bi = fm_pool(emb, reduce_dim=False)                      # [B, E]
        bi = BatchNorm(channel_axis=-1, name="fm_bn")(bi, train)
        bi = nn.Dropout(self.dropout, deterministic=not train)(bi)
        y = FeaturesLinear(self.nfeat, name="linear")(ids, values)
        return add_first_order(y, squeeze_logits(
            MLP(self.mlp_nlayer, self.mlp_nhid, self.dropout, self.noutput,
                name="mlp")(bi, train)))
