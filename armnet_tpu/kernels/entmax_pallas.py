"""Pallas TPU kernel for alpha-entmax bisection (forward + backward).

Why a kernel: under XLA the 50-iteration bisection is a while-loop whose
carried [B,O,F] state spills to HBM every iteration once it exceeds VMEM —
measured 40 ms for [4096,128,39] f32 on v5e vs 1.8 ms for softmax. This
kernel tiles the row axis, runs the entire bisection on a VMEM-resident tile,
and touches HBM exactly once in and once out per tile.

Design notes:
  * rows = all leading dims collapsed; the normalized axis is minor (lanes).
  * alpha is a static python float -> the generating-function exponent
    1/(alpha-1) specializes at trace time: alpha=2 (sparsemax) costs no
    transcendentals, alpha=1.5 costs a single multiply (z^2), generic alpha
    uses exp/log.
  * backward is its own kernel using only the saved output Y:
    g = Y^(2-alpha) on the support; dX = dY*g - (sum(dY*g)/sum(g))*g.
  * float32 throughout — bf16 cannot resolve a 2^-50 bracket.

Numerics match armnet_tpu.ops.entmax (the jnp twin) to ~1e-6; tests compare
both on CPU via interpret mode and on TPU compiled.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["entmax_pallas"]

_ROW_BLOCK = 1024


from armnet_tpu.kernels.entmax_common import pow_static as _pow_static


def _fwd_kernel(x_ref, y_ref, *, alpha, n_iter):
    # Layout: [F, rows] — the normalized axis on SUBLANES, rows on lanes, so
    # every one of the 128 VPU lanes does useful work (F is 10..43 in this
    # domain; lane-minor F would waste 3.3x of the VPU on padding).
    # Solve: bisection warmup + safeguarded Newton (kernels/entmax_common.py)
    # — ~13 pow evaluations instead of the reference's 50 bisections.
    from armnet_tpu.kernels.entmax_common import solve_entmax_axis0

    x = x_ref[:].astype(jnp.float32)
    p = solve_entmax_axis0(x, alpha, n_iter)
    y_ref[:] = p.astype(y_ref.dtype)


def _bwd_kernel(y_ref, dy_ref, dx_ref, *, alpha):
    y = y_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    gppr = jnp.where(y > 0, _pow_static(y, 2.0 - alpha), 0.0)
    dx = dy * gppr
    q = jnp.sum(dx, 0, keepdims=True) / jnp.sum(gppr, 0, keepdims=True)
    dx = dx - q * gppr
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _interpret():
    """Compiled Pallas is TPU-only; anywhere else run the interpreter so a
    forced --kernels pallas still works (slow but correct)."""
    import jax

    return jax.default_backend() != "tpu"


def _col_call(kernel, n_in, d, rows, dtype):
    """Grid over lane-blocks of rows; each tile is [F, _ROW_BLOCK]."""
    grid = (pl.cdiv(rows, _ROW_BLOCK),)
    spec = pl.BlockSpec((d, _ROW_BLOCK), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return functools.partial(
        pl.pallas_call, kernel,
        grid=grid,
        in_specs=[spec] * n_in,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((d, rows), dtype),
        interpret=_interpret(),
    )


def _fwd2d(x, alpha, n_iter):
    # x is already [d, rows] — the kernel's native layout.
    d, rows = x.shape
    call = _col_call(functools.partial(_fwd_kernel, alpha=alpha,
                                       n_iter=n_iter), 1, d, rows, x.dtype)
    return call()(x)


def _bwd2d(y, dy, alpha):
    d, rows = y.shape
    call = _col_call(functools.partial(_bwd_kernel, alpha=alpha), 2, d, rows,
                     y.dtype)
    return call()(y, dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _entmax2d(x, alpha, n_iter):
    return _fwd2d(x, alpha, n_iter)


def _entmax2d_fwd(x, alpha, n_iter):
    y = _fwd2d(x, alpha, n_iter)
    return y, y


def _entmax2d_bwd(alpha, n_iter, y, dy):
    return (_bwd2d(y, dy, alpha),)


_entmax2d.defvjp(_entmax2d_fwd, _entmax2d_bwd)


_F32_CONVERGED_ITERS = 30


# ---- mid-axis 3-D entry (zero relayout) ------------------------------------
# For [B, d, C] inputs normalized over axis 1 (the fields-major ARM layouts:
# [B, F, K*O] multi-head gates, [B, F, O] one-head), a moveaxis-to-front
# would physically relayout the whole tensor on BOTH sides of the kernel
# (~164 MB each way at the Criteo multi-head shape). Instead, tile the
# input directly: a [BB, d, LB] block is BB native [d-sublane, LB-lane]
# tiles — exactly the kernel's working layout — so the only HBM traffic is
# the one required read and write.

_MID_LANE_BLOCK = 256
_MID_BATCH_BLOCK = 8


def _mid_blocks(b, c):
    """Pick (BB, LB) dividing (b, c) with LB a lane multiple, else None."""
    lb = None
    for cand in (_MID_LANE_BLOCK, 128):
        if c % cand == 0:
            lb = cand
            break
    if lb is None:
        return None
    bb = 1
    for cand in (_MID_BATCH_BLOCK, 4, 2):
        if b % cand == 0:
            bb = cand
            break
    return bb, lb


def _mid_fwd_kernel(x_ref, y_ref, *, alpha, n_iter, bb):
    from armnet_tpu.kernels.entmax_common import solve_entmax_axis0

    for i in range(bb):                       # static unroll over batch rows
        x = x_ref[i].astype(jnp.float32)      # [d, LB]
        y_ref[i] = solve_entmax_axis0(x, alpha, n_iter).astype(y_ref.dtype)


def _mid_bwd_kernel(y_ref, dy_ref, dx_ref, *, alpha, bb):
    for i in range(bb):
        y = y_ref[i].astype(jnp.float32)
        dy = dy_ref[i].astype(jnp.float32)
        gppr = jnp.where(y > 0, _pow_static(y, 2.0 - alpha), 0.0)
        dx = dy * gppr
        q = jnp.sum(dx, 0, keepdims=True) / jnp.sum(gppr, 0, keepdims=True)
        dx_ref[i] = (dx - q * gppr).astype(dx_ref.dtype)


def _mid_call(kernel, n_in, shape, bb, lb, dtype):
    b, d, c = shape
    grid = (b // bb, c // lb)
    spec = pl.BlockSpec((bb, d, lb), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    return functools.partial(
        pl.pallas_call, kernel,
        grid=grid,
        in_specs=[spec] * n_in,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        interpret=_interpret(),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _entmax_mid(x, alpha, n_iter):
    bb, lb = _mid_blocks(x.shape[0], x.shape[2])
    call = _mid_call(functools.partial(_mid_fwd_kernel, alpha=alpha,
                                       n_iter=n_iter, bb=bb), 1, x.shape,
                     bb, lb, x.dtype)
    return call()(x)


def _entmax_mid_fwd(x, alpha, n_iter):
    y = _entmax_mid(x, alpha, n_iter)
    return y, y


def _entmax_mid_bwd(alpha, n_iter, y, dy):
    bb, lb = _mid_blocks(y.shape[0], y.shape[2])
    call = _mid_call(functools.partial(_mid_bwd_kernel, alpha=alpha, bb=bb),
                     2, y.shape, bb, lb, y.dtype)
    return (call()(y, dy),)


_entmax_mid.defvjp(_entmax_mid_fwd, _entmax_mid_bwd)


def entmax_pallas(x, alpha=1.5, axis=-1, n_iter=50):
    """Drop-in replacement for ops.entmax.entmax_bisect with a static float
    alpha (the kernel specializes on it at trace time).

    The kernel always bisects in f32, where the tau bracket stops shrinking
    after ~27 halvings (mantissa exhausted) — iterations are capped at 30,
    bitwise identical to the reference's 50 (verified on-device) and ~1.7x
    cheaper for generic alpha (one transcendental pow per iteration)."""
    n_iter = min(int(n_iter), _F32_CONVERGED_ITERS)
    alpha = float(alpha)
    if alpha <= 1.0:
        raise ValueError("entmax_pallas requires alpha > 1 (use softmax at 1)")
    orig_dtype = x.dtype
    x = jnp.asarray(x, jnp.float32)
    # Mid-axis 3-D fast path: [B, d, C] normalized over axis 1 with a
    # lane-aligned C tiles DIRECTLY ([BB, d, LB] blocks are native
    # d-sublane tiles) — zero relayout in or out.
    if x.ndim == 3 and axis in (1, -2) and _mid_blocks(x.shape[0],
                                                       x.shape[2]):
        return _entmax_mid(x, alpha, n_iter).astype(orig_dtype)
    # General case: the kernel's native layout is [d, rows] (normalized
    # axis on sublanes). Move the normalized axis to the FRONT, never to
    # the back: for a mid-axis input this preserves the well-tiled minor
    # dim through the relayout, while a moveaxis to -1 would materialize
    # a d-minor tensor lane-padded 128/d (~3.3x at F=39) on both sides
    # of the kernel.
    x = jnp.moveaxis(x, axis, 0)
    shape = x.shape
    y = _entmax2d(x.reshape(shape[0], -1), alpha, n_iter).reshape(shape)
    y = jnp.moveaxis(y, 0, axis)
    return y.astype(orig_dtype)
