"""AFN (Cheng 2020): logarithmic neural transformation — log of a
positivity-constrained embedding, a learned F->h linear in log space, exp back,
BN at both ends, then an MLP; optional DNN ensemble
(spec: /root/reference/models/afn.py).

Positivity: the reference mutates the embedding table in place each forward
(abs then clamp min 1e-4). Functionally we reparametrize: the *effective*
table read in the forward pass is clip(|W|, 1e-4, inf) — identical forward
values. The clamp is STRAIGHT-THROUGH (stop_gradient on the clip delta):
a plain clip would zero the gradient for every |W| < 1e-4, an absorbing
dead zone the reference doesn't have (its no_grad mutation keeps clamped
weights fully trainable — grads flow at the clamped value)."""

import flax.linen as nn
import jax
import jax.numpy as jnp

from armnet_tpu.models.common import VALUE_CLAMP, DeepEnsemble, split_batch, squeeze_logits
from armnet_tpu.ops import initializers as init
from armnet_tpu.ops.embedding import scaled_embedding_lookup
from armnet_tpu.ops.layers import MLP, BatchNorm


class AFN(nn.Module):
    nfield: int
    nfeat: int
    nemb: int
    afn_hid: int
    mlp_nlayer: int
    mlp_nhid: int
    dropout: float
    ensemble: bool
    deep_nlayer: int
    deep_nhid: int
    noutput: int = 1

    @nn.compact
    def __call__(self, batch, train: bool = False):
        ids, values = split_batch(batch)
        values = jnp.clip(values, *VALUE_CLAMP)

        from armnet_tpu.ops.embedding import ONE_HOT_MAX_ROWS

        # flat storage for large tables (same T(8,128) lane-pad reason as
        # ops/layers.Embedding); the positivity transform is elementwise so
        # it is layout-agnostic
        if self.nfeat > ONE_HOT_MAX_ROWS:
            table = self.param(
                "embedding", init.xavier_uniform_flat(self.nfeat, self.nemb),
                (self.nfeat * self.nemb,))
        else:
            table = self.param("embedding", init.xavier_uniform(),
                               (self.nfeat, self.nemb))
        w_abs = jnp.abs(table)
        # straight-through clamp: forward clip(|W|, 1e-4), backward d|W|
        pos_table = w_abs + jax.lax.stop_gradient(
            jnp.clip(w_abs, 1e-4, None) - w_abs)
        emb = scaled_embedding_lookup(pos_table, ids, values,
                                      nemb=self.nemb)             # [B,F,E] > 0

        x_log = BatchNorm(channel_axis=1, name="emb_bn")(jnp.log(emb), train)
        x_log = x_log.transpose(0, 2, 1)                           # [B,E,F]
        afn_w = self.param("afn_kernel",
                           lambda k, s: jax.random.normal(k, s) * 0.1,
                           (self.nfield, self.afn_hid))
        afn_b = self.param("afn_bias", init.zeros, (self.afn_hid,))
        afn = jnp.exp(jnp.matmul(x_log, afn_w) + afn_b)            # [B,E,O]
        afn = BatchNorm(channel_axis=1, name="afn_bn")(
            afn.transpose(0, 2, 1), train)                         # [B,O,E]
        afn = afn.reshape(afn.shape[0], self.afn_hid * self.nemb)
        afn = nn.Dropout(self.dropout, deterministic=not train)(afn)

        y = MLP(self.mlp_nlayer, self.mlp_nhid, self.dropout, self.noutput,
                name="mlp")(afn, train)
        if self.ensemble:
            y = DeepEnsemble(self.nfeat, self.nemb,
                             self.deep_nlayer, self.deep_nhid, self.dropout,
                             self.noutput, name="ensemble")(y, ids, values, train)
        return squeeze_logits(y)
