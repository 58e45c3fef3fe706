"""Initializers matching the reference's PyTorch init semantics.

AUC parity is sensitive to init scale, so these replicate:
  * torch.nn.init.xavier_uniform_ with gain (incl. torch's fan computation for
    >2-D tensors: fan_in = shape[1]*prod(shape[2:]), fan_out = shape[0]*prod).
  * torch.nn.Linear's default init (kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))
    for both weight and bias).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["xavier_uniform", "xavier_uniform_flat",
           "xavier_uniform_stacked", "normal_unit",
           "torch_linear_uniform", "zeros", "constant"]


def _torch_fans(shape):
    if len(shape) < 2:
        raise ValueError(f"xavier init needs >=2 dims, got {shape}")
    rf = int(np.prod(shape[2:])) if len(shape) > 2 else 1
    fan_in = shape[1] * rf
    fan_out = shape[0] * rf
    return fan_in, fan_out


def xavier_uniform(gain=1.0, transpose_fans=False):
    """torch-compatible xavier_uniform_. Symmetric in fan_in/fan_out for 2-D,
    so flax's [in, out] kernel orientation needs no flag there; set
    `transpose_fans` when a >2-D param is stored transposed vs the reference."""

    def init(key, shape, dtype=jnp.float32):
        fshape = tuple(reversed(shape)) if transpose_fans else shape
        fan_in, fan_out = _torch_fans(fshape)
        a = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)

    return init


def torch_linear_uniform(fan_in):
    """torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    """All-ones (BatchNorm scale)."""
    del key
    return jnp.ones(shape, dtype)


def constant(value):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


def xavier_uniform_flat(nrows, ncols, gain=1.0):
    """xavier_uniform_ for a logically-[nrows, ncols] table stored FLAT
    [nrows*ncols] (unpadded TPU layout; see ops/embedding.py). Identical iid
    element distribution to the 2-D init."""
    import jax
    import math

    def init(key, shape, dtype=jnp.float32):
        assert shape == (nrows * ncols,), (shape, nrows, ncols)
        a = gain * math.sqrt(6.0 / (nrows + ncols))
        return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)

    return init


def xavier_uniform_stacked(gain=1.0):
    """Per-matrix torch xavier for a LEADING-stacked param [H, in, out]:
    fans come from the trailing 2 dims only, reproducing H independent
    xavier_uniform_(gain) matrices (GAT's per-head W ParameterList,
    /root/reference/models/gat.py:14-16). _torch_fans over the full shape
    would fold H into both fans and under-scale every entry by sqrt(H)."""
    import jax

    def init(key, shape, dtype=jnp.float32):
        assert len(shape) >= 2
        fan_in, fan_out = shape[-2], shape[-1]
        a = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)

    return init


def normal_unit():
    """torch nn.Embedding's DEFAULT init: N(0, 1) — the reference's Linear
    keeps it for the first-order weight (models/layers.py:27 wraps
    nn.Embedding(nfeat, 1) and never re-inits), unlike Embedding which is
    explicitly xavier'd."""
    import jax

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype)

    return init
