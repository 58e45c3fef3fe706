"""AFN (Cheng 2020): logarithmic neural transformation — log of a
positivity-constrained embedding, a learned F->h linear in log space, exp back,
BN at both ends, then an MLP; optional DNN ensemble
(spec: /root/reference/models/afn.py).

Positivity: the reference mutates the embedding table IN PLACE each forward
(abs then clamp min 1e-4, under no_grad — afn.py:74-78), so its gradients
and Adam act on the already-positive stored weights with IDENTITY geometry.
Torch-exact semantics here: `embedding_positivity` (below) is applied to
the STORED params at the head of every train/eval step (train/step.py
param_transform), after which the in-forward clampabs is a numerical no-op
with identity gradient — exactly the reference's geometry. (An earlier
straight-through reparametrization of the clamp is mirror-equivalent for
weights that never cross the clamp boundary — Adam's per-coordinate updates
are sign-symmetric — so this change alone moved the 20-epoch AUC little;
it is kept because it is exact rather than almost-exact, pinned by
test_afn_trajectory_matches_reference.) The r5 convergence gap itself
(-0.018 valid AUC, 3 seeds) was BN running-stat pollution from the padded
last batch — AFN's log path amplifies pad rows into -6.9-per-element
outliers — fixed by masked BN statistics (ops/layers.py batch_mask_scope).
The forward keeps the clampabs so standalone applies (transplant tests,
predict.py) see reference-identical values on any params."""

import flax.linen as nn
import jax
import jax.numpy as jnp

from armnet_tpu.models.common import VALUE_CLAMP, DeepEnsemble, split_batch, squeeze_logits
from armnet_tpu.ops import initializers as init
from armnet_tpu.ops.embedding import scaled_embedding_lookup
from armnet_tpu.ops.layers import MLP, BatchNorm


def embedding_positivity(params):
    """Torch-exact AFN weight mutation (reference afn.py:74-78): the stored
    interaction-embedding table becomes max(|W|, 1e-4) before every step.
    Applied by the trainer as a param_transform; the ensemble's deep table
    is untouched (the reference clamps only self.embedding)."""
    params = dict(params)
    params["embedding"] = jnp.maximum(jnp.abs(params["embedding"]), 1e-4)
    return params


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
        # clampabs via where, not jnp.maximum: after the step-level
        # embedding_positivity mutation the table is >= 1e-4 with entries AT
        # the boundary (the clamped ones), and jnp.maximum splits the
        # gradient 0.5/0.5 on ties — torch's in-place mutation gives those
        # weights gradient 1.0. where routes the full gradient through the
        # selected branch: identity for |W| >= 1e-4 (boundary included),
        # matching torch exactly; on raw signed params (standalone apply)
        # the forward values still reproduce the reference's clampabs
        pos_abs = jnp.abs(table)
        pos_table = jnp.where(pos_abs >= 1e-4, pos_abs, 1e-4)
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
