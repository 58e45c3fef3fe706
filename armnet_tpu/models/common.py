"""Pieces shared across the model zoo: input handling, ensemble tower."""

import flax.linen as nn
import jax.numpy as jnp

from armnet_tpu.ops import initializers as init
from armnet_tpu.ops.layers import MLP, Embedding

__all__ = ["split_batch", "squeeze_logits", "add_first_order", "DeepEnsemble",
           "VALUE_CLAMP"]

# The ARM/AFN family clamps input values into [1e-3, 1] so the exp/log
# interactions stay bounded (reference armnet.py:82, armnet_1h.py:81,
# afn.py:49, gc_arm.py:86, sa_glu.py:42). Functional here — the reference
# mutates the caller's batch in place; we never do.
VALUE_CLAMP = (1e-3, 1.0)


def split_batch(batch):
    """batch {'id': int [B,F], 'value': float [B,F], ...} -> (ids, values)."""
    return batch["id"], batch["value"]


def squeeze_logits(y):
    """[B, 1] -> [B] (torch .squeeze() parity for the binary head)."""
    return jnp.squeeze(y, axis=-1) if y.ndim == 2 and y.shape[-1] == 1 else y


def add_first_order(y_lin, y_deep):
    """Combine the scalar first-order term [B] with the deep head: [B] stays
    elementwise (binary parity); a multi-class head [B, C] broadcasts the
    first-order logit across classes."""
    return y_lin + y_deep if y_deep.ndim == 1 else y_lin[:, None] + y_deep


class DeepEnsemble(nn.Module):
    """Optional DNN ensemble tower: a separate embedding + MLP whose logit is
    combined with the main logit by a learned Linear(2,1) initialized to
    0.5/0.5 weights and 0 bias (reference armnet.py:70-75)."""

    nfeat: int
    nemb: int
    nlayer: int
    nhid: int
    dropout: float = 0.0
    noutput: int = 1

    @nn.compact
    def __call__(self, y, ids, values, train: bool):
        emb = Embedding(self.nfeat, self.nemb, name="deep_embedding")(ids, values)
        flat = emb.reshape(emb.shape[0], -1)
        y_deep = MLP(self.nlayer, self.nhid, self.dropout, self.noutput,
                     name="deep_mlp")(flat, train)
        both = jnp.concatenate([y, y_deep], axis=-1)          # [B, 2*noutput]
        kernel = self.param("ens_kernel", init.constant(0.5),
                            (2 * self.noutput, self.noutput))
        bias = self.param("ens_bias", init.zeros, (self.noutput,))
        return jnp.matmul(both, kernel) + bias
