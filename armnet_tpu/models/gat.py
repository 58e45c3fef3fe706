"""GAT over the field graph (Veličković 2018): multi-head additive attention
over all F^2 field pairs (spec: /root/reference/models/gat.py, including its
multiplicative adj-mask quirk: scores are *multiplied* by the mask rather than
added, so for the default all-ones adjacency the mask is a no-op).

TPU redesign: the per-head python loop over pair-concat Linears becomes a
single stacked einsum over a [H, ...] head axis — one MXU-batched matmul
instead of H small ones."""

import flax.linen as nn
import jax
import jax.numpy as jnp

from armnet_tpu.models.common import split_batch, squeeze_logits
from armnet_tpu.ops import initializers as init
from armnet_tpu.ops.layers import MLP, Embedding


class GraphAttention(nn.Module):
    noutfeat: int
    nhead: int
    dropout: float
    alpha: float  # LeakyReLU negative slope

    @nn.compact
    def __call__(self, x, adj, train: bool):
        ninfeat = x.shape[-1]
        nfield = x.shape[1]
        # stacked per-head projection [H, in, out]: each head's matrix gets
        # its own xavier (gain 1.414) over (in, out) fans — the reference
        # inits H separate (in, out) params (gat.py:14-16); whole-shape fans
        # would under-scale by sqrt(H)
        W = self.param("W", init.xavier_uniform_stacked(1.414),
                       (self.nhead, ninfeat, self.noutfeat))
        # per-head pair scorer a: Linear(2*out -> 1, no bias), split into the
        # src/dst halves so we can score without materializing concat pairs
        a = self.param("a", init.torch_linear_uniform(2 * self.noutfeat),
                       (self.nhead, 2 * self.noutfeat))
        a_src, a_dst = a[:, : self.noutfeat], a[:, self.noutfeat:]

        h = jnp.einsum("bfi,hio->bhfo", x, W)                   # [B,H,F,out]
        e_src = jnp.einsum("bhfo,ho->bhf", h, a_src)
        e_dst = jnp.einsum("bhfo,ho->bhf", h, a_dst)
        e = e_src[:, :, :, None] + e_dst[:, :, None, :]         # [B,H,F,F]
        e = nn.leaky_relu(e, negative_slope=self.alpha)

        mask = jnp.where(adj > 0, adj, -9e15)                   # [F, F]
        attn = e * mask[None, None]                             # multiplicative (parity)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhxy,bhyo->bhxo", attn, h)            # [B,H,F,out]
        return out.transpose(0, 2, 1, 3).reshape(x.shape[0], nfield, -1)


class GAT(nn.Module):
    nfield: int
    nfeat: int
    nemb: int
    gat_layers: int
    gat_hid: int
    mlp_nlayer: int
    mlp_nhid: int
    dropout: float
    alpha: float = 0.2
    nhead: int = 8
    noutput: int = 1

    @nn.compact
    def __call__(self, batch, train: bool = False, adj=None):
        ids, values = split_batch(batch)
        h = Embedding(self.nfeat, self.nemb, name="embedding")(ids, values)
        if adj is None:
            adj = jnp.ones((self.nfield, self.nfield), h.dtype)
        for l in range(self.gat_layers):
            h = GraphAttention(self.gat_hid, self.nhead, self.dropout,
                               self.alpha, name=f"gat_{l}")(h, adj, train)
            h = nn.elu(nn.Dropout(self.dropout, deterministic=not train)(h))
        flat = h.reshape(h.shape[0], -1)
        return squeeze_logits(
            MLP(self.mlp_nlayer, self.mlp_nhid, self.dropout, self.noutput,
                name="affine")(flat, train))
