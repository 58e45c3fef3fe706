"""alpha-entmax via bisection, with a hand-written closed-form VJP.

This is the sparsity engine of ARM-Net: entmax with alpha in (1, 2] interpolates
between softmax (alpha -> 1) and sparsemax (alpha = 2), zeroing out most of the
field axis so each exponential neuron models a cross-feature over an adaptively
*selected* field subset.

Behavioral contract (matches the reference bisection algorithm at
/root/reference/utils/entmax.py:29-100, re-derived from Peters et al. 2019 /
Correia et al. 2019, arXiv:1905.05702):

  forward:  scale X by (alpha-1); bracket the threshold tau between
            max(X)-1 and max(X)-d^(1-alpha); halve the bracket `n_iter` times,
            keeping the midpoint whose residual has the same sign as the lower
            bound; p = clamp(X - tau, 0)^(1/(alpha-1)), renormalized to sum 1.
  backward: with Y the forward output and g = Y^(2-alpha) masked to the
            support {Y > 0}:   dX = dY*g - (sum(dY*g)/sum(g)) * g
            and (optionally, if alpha is being learned) the Tsallis-entropy
            d/d_alpha term.

The bisection always runs in float32 — bf16 cannot resolve a 2^-50 bracket.

TPU notes: the loop body is element-wise VPU work over [..., d]; under jit XLA
compiles the `fori_loop` into a single fused while-loop that stays on-chip.
A fused Pallas variant (gates -> entmax -> exp-cross) lives in
armnet_tpu/kernels/arm_pallas.py.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["entmax_bisect", "sparsemax_bisect", "sparse_normalizer"]


def _p(z, inv_am1):
    """p(z) = clamp(z, 0) ** (1/(alpha-1)), the entmax generating function inverse."""
    return jnp.power(jnp.maximum(z, 0.0), inv_am1)


def _entmax_forward(x, alpha, n_iter):
    """Bisection solve. x: [..., d] float32. alpha broadcastable to x[..., :1]."""
    am1 = alpha - 1.0
    inv_am1 = 1.0 / am1
    xs = x * am1
    d = x.shape[-1]

    max_val = jnp.max(xs, axis=-1, keepdims=True)
    # gp(1, alpha) = 1^(alpha-1) = 1 ; gp(1/d, alpha) = (1/d)^(alpha-1)
    tau_lo = max_val - 1.0
    tau_hi = max_val - jnp.power(jnp.asarray(1.0 / d, x.dtype), am1)
    f_lo = jnp.sum(_p(xs - tau_lo, inv_am1), axis=-1, keepdims=True) - 1.0
    dm = tau_hi - tau_lo

    def body(_, carry):
        dm, tau_lo, _ = carry
        dm = dm * 0.5
        tau_m = tau_lo + dm
        f_m = jnp.sum(_p(xs - tau_m, inv_am1), axis=-1, keepdims=True) - 1.0
        tau_lo = jnp.where(f_m * f_lo >= 0, tau_m, tau_lo)
        return dm, tau_lo, tau_m

    _, _, tau_m = lax.fori_loop(0, n_iter, body, (dm, tau_lo, tau_lo))
    p = _p(xs - tau_m, inv_am1)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    return p


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _entmax_core(x, alpha, n_iter):
    return _entmax_forward(x, alpha, n_iter)


def _entmax_core_fwd(x, alpha, n_iter):
    y = _entmax_forward(x, alpha, n_iter)
    return y, (y, alpha)


def _entmax_core_bwd(n_iter, res, dY):
    y, alpha = res
    am1 = alpha - 1.0
    # g = Y^(2-alpha) on the support; off-support Y=0 contributes nothing.
    gppr = jnp.where(y > 0, jnp.power(jnp.maximum(y, 1e-38), 1.0 - am1), 0.0)
    dX = dY * gppr
    q = jnp.sum(dX, axis=-1, keepdims=True) / jnp.sum(gppr, axis=-1, keepdims=True)
    dX = dX - q * gppr

    # d/d_alpha (only materialized if alpha is traced with a cotangent):
    # Shannon terms over the support, Tsallis correction (arXiv:1905.05702 eq. 14).
    S = jnp.where(y > 0, y * jnp.log(jnp.maximum(y, 1e-38)), 0.0)
    ent = jnp.sum(S, axis=-1, keepdims=True)
    y_skewed = gppr / jnp.sum(gppr, axis=-1, keepdims=True)
    d_alpha = dY * (y - y_skewed) / jnp.square(am1)
    d_alpha = d_alpha - dY * (S - y_skewed * ent) / am1
    d_alpha = jnp.sum(d_alpha, axis=-1, keepdims=True)
    # reduce to alpha's broadcast shape
    d_alpha = _sum_to_shape(d_alpha, jnp.shape(alpha))
    return dX, d_alpha


def _sum_to_shape(x, shape):
    if jnp.shape(x) == tuple(shape):
        return x
    ndiff = x.ndim - len(shape)
    x = jnp.sum(x, axis=tuple(range(ndiff)))
    keep = tuple(i for i, s in enumerate(shape) if s == 1 and x.shape[i] != 1)
    x = jnp.sum(x, axis=keep, keepdims=True)
    return jnp.reshape(x, shape)


_entmax_core.defvjp(_entmax_core_fwd, _entmax_core_bwd)


# ---- static-alpha fast path -------------------------------------------------
# With a concrete python alpha the generating-function exponents specialize at
# trace time (alpha=2 -> identity, 1.5 -> square / sqrt), instead of a generic
# pow(x, traced) = exp(log) per element per bisection iteration.

# the static-exponent specialization tables live in ONE place
# (kernels/entmax_common) so a new specialized alpha or clamp change
# cannot silently diverge between the jnp path and the Pallas kernels
from armnet_tpu.kernels.entmax_common import (pow_inv as _pow_inv_static,
                                              pow_static as _pow_static)


def _entmax_forward_static(x, alpha, n_iter):
    am1 = alpha - 1.0
    inv_am1 = 1.0 / am1
    xs = x * am1
    d = x.shape[-1]
    max_val = jnp.max(xs, axis=-1, keepdims=True)
    tau_lo = max_val - 1.0
    tau_hi = max_val - (1.0 / d) ** am1
    f_lo = jnp.sum(_pow_inv_static(xs - tau_lo, inv_am1), -1,
                   keepdims=True) - 1.0
    dm = tau_hi - tau_lo

    def body(_, carry):
        dm, tau_lo, _ = carry
        dm = dm * 0.5
        tau_m = tau_lo + dm
        f_m = jnp.sum(_pow_inv_static(xs - tau_m, inv_am1), -1,
                      keepdims=True) - 1.0
        tau_lo = jnp.where(f_m * f_lo >= 0, tau_m, tau_lo)
        return dm, tau_lo, tau_m

    _, _, tau_m = lax.fori_loop(0, n_iter, body, (dm, tau_lo, tau_lo))
    p = _pow_inv_static(xs - tau_m, inv_am1)
    return p / jnp.sum(p, -1, keepdims=True)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _entmax_core_static(x, alpha, n_iter):
    return _entmax_forward_static(x, alpha, n_iter)


def _entmax_core_static_fwd(x, alpha, n_iter):
    y = _entmax_forward_static(x, alpha, n_iter)
    return y, y


def _entmax_core_static_bwd(alpha, n_iter, y, dY):
    gppr = jnp.where(y > 0, _pow_static(y, 2.0 - alpha), 0.0)
    dX = dY * gppr
    q = jnp.sum(dX, -1, keepdims=True) / jnp.sum(gppr, -1, keepdims=True)
    return (dX - q * gppr,)


_entmax_core_static.defvjp(_entmax_core_static_fwd, _entmax_core_static_bwd)


def entmax_bisect(x, alpha=1.5, axis=-1, n_iter=50):
    """alpha-entmax: normalizing sparse transform (a la softmax).

    Solves  max_p <x, p> - H_a(p)  s.t.  p >= 0, sum(p) == 1  where H_a is the
    Tsallis alpha-entropy, by bisection on the threshold. Differentiable w.r.t.
    both `x` and `alpha` (closed-form VJP, no differentiation through the loop).

    Args:
      x: input array; the transform is applied along `axis`.
      alpha: float or array broadcastable to x with `axis` collapsed to 1.
        alpha=2 is sparsemax; alpha -> 1 approaches softmax (use softmax
        directly at alpha == 1; this path divides by alpha-1).
      axis: axis to normalize over.
      n_iter: bisection iterations (50 brackets tau to ~2^-50).

    Returns:
      Array like x, summing to 1 along `axis`, typically sparse.

    Dispatch: a concrete python `alpha` takes the specialized static path —
    the Pallas VMEM-resident kernel on TPU (armnet_tpu.kernels.entmax_pallas),
    or the exponent-specialized jnp path elsewhere. A traced `alpha` (being
    learned) uses the generic differentiable-in-alpha path.
    """
    orig_dtype = x.dtype
    if isinstance(alpha, (int, float)) and float(alpha) > 1.0:
        from armnet_tpu.kernels.config import use_pallas

        if use_pallas():
            from armnet_tpu.kernels.entmax_pallas import entmax_pallas

            return entmax_pallas(x, float(alpha), axis=axis, n_iter=n_iter)
        x = jnp.asarray(x, jnp.float32)
        if axis not in (-1, x.ndim - 1):
            x = jnp.moveaxis(x, axis, -1)
            y = _entmax_core_static(x, float(alpha), n_iter)
            y = jnp.moveaxis(y, -1, axis)
        else:
            y = _entmax_core_static(x, float(alpha), n_iter)
        return y.astype(orig_dtype)

    x = jnp.asarray(x, jnp.float32)
    alpha = jnp.asarray(alpha, jnp.float32)
    if alpha.ndim == x.ndim and axis not in (-1, x.ndim - 1):
        alpha = jnp.moveaxis(alpha, axis, -1)
    if axis not in (-1, x.ndim - 1):
        x = jnp.moveaxis(x, axis, -1)
        y = _entmax_core(x, alpha, n_iter)
        y = jnp.moveaxis(y, -1, axis)
    else:
        y = _entmax_core(x, alpha, n_iter)
    return y.astype(orig_dtype)


def sparsemax_bisect(x, axis=-1, n_iter=50):
    """sparsemax (Euclidean projection onto the simplex) via bisection."""
    return entmax_bisect(x, alpha=2.0, axis=axis, n_iter=n_iter)


def sparse_normalizer(alpha, axis=-1, n_iter=50):
    """Return the field-axis normalizer used by ARM attention layers.

    Matches the reference call-site convention (softmax when alpha == 1.0,
    entmax otherwise; /root/reference/models/armnet.py:12-13).
    """
    if alpha == 1.0:
        return lambda x: jax.nn.softmax(x, axis=axis)
    return lambda x: entmax_bisect(x, alpha=alpha, axis=axis, n_iter=n_iter)
