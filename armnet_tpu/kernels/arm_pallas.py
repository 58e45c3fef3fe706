"""Fused Pallas TPU kernel for the ARM-Net one-head interaction.

The ARM-1h hot path (reference models/armnet_1h.py:25-34,85-86) is

    keys = emb @ Wk                      [B,F,dk]
    g    = (keys @ query^T) * dk^-1/2    [B,F,O]   (gates per neuron/field)
    y    = entmax_alpha(g, axis=F)                 (adaptive field selection)
    w    = y * values^T                  [B,F,O]   (signed exponents)
    out  = exp(einsum('bfo,bfe->boe'))   [B,O,E]   (exponential neurons)

Under XLA + the standalone entmax kernel, the [B,O,F] intermediates make
four HBM round trips per step (~82 MB each at the Criteo recipe: B=4096,
O=128, F=39). This kernel runs the whole chain on a VMEM-resident batch
tile: HBM traffic is emb in (1.6 MB) + out (20 MB) — everything between
stays on-chip.

Layout: every intermediate lives in [B_tile, F, O] — O on lanes (h=128 in
the headline recipe fills them exactly), F on sublanes, so the entmax
bisection reduces over sublanes and NO in-kernel transposes are needed.

Backward is recompute-style (the flash-attention trick): rather than saving
the [B,F,O] sparse weights to HBM, the bwd kernel replays the forward from
emb (the bisection re-run costs ~0.07 ms; the avoided write+read of w costs
~0.2 ms at v5e HBM bandwidth) and emits all four parameter grads fused,
accumulating dWk/dquery/dvalues across the sequential batch-tile grid.

Numerics match the jnp twin (ops.interaction.arm_attention_1h +
arm_exp_cross with ops.entmax) to ~1e-5; parity-tested on CPU via
interpret mode and on TPU compiled.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["arm1h_fused", "arm1h_reference"]

_LANE = 128
_SUBLANE = 8
_FWD_VMEM_BUDGET = 6 * 1024 * 1024
_BWD_VMEM_BUDGET = 9 * 1024 * 1024


def _pad_up(x, m):
    return -(-x // m) * m


from armnet_tpu.kernels.entmax_common import pow_static as _pow_static


def _bisect_axis1(x, alpha, n_iter):
    """alpha-entmax over axis 1 of a 3-D [BB,F,O] value.

    Lowering note (measured on v5e): reducing over the sublane axis of the
    (F,O) tile is ~5x slower under Mosaic than reducing over the MAJOR axis
    of an [F,BB,O] layout, so we transpose in/out of the loop (one relayout
    each way vs 50 slow reductions). The f32 bracket cannot shrink past the
    mantissa after ~27 halvings, so effective iterations are capped — results
    are bitwise identical to n_iter=50 (tested)."""
    y = _bisect_axis0(jnp.transpose(x, (1, 0, 2)), alpha, n_iter)
    return jnp.transpose(y, (1, 0, 2))


def _bisect_axis0(x, alpha, n_iter):
    """alpha-entmax over the major axis (hybrid bisection+Newton solver,
    kernels/entmax_common.py)."""
    from armnet_tpu.kernels.entmax_common import solve_entmax_axis0

    return solve_entmax_axis0(x, alpha, n_iter)


def _bisect_bwd_axis1(y, dy, alpha):
    """Closed-form entmax VJP over axis 1 of [BB,F,O]: g = y^(2-alpha) on the
    support, dx = dy*g - (sum dy*g / sum g)*g (reference utils/entmax.py:
    71-100). Same major-axis-reduction layout trick as the forward."""
    y = jnp.transpose(y, (1, 0, 2))
    dy = jnp.transpose(dy, (1, 0, 2))
    gppr = jnp.where(y > 0, _pow_static(y, 2.0 - alpha), 0.0)
    dx = dy * gppr
    q = jnp.sum(dx, 0, keepdims=True) / jnp.sum(gppr, 0, keepdims=True)
    return jnp.transpose(dx - q * gppr, (1, 0, 2))


def _replay(e, wk, q, vt, scale, alpha, n_iter):
    """emb tile -> (keys, y, w): the shared forward chain."""
    bb, f, _ = e.shape
    keys = jnp.einsum("bfe,ed->bfd", e, wk,
                      preferred_element_type=jnp.float32)
    g = jnp.einsum("bfd,od->bfo", keys, q,
                   preferred_element_type=jnp.float32) * scale
    y = _bisect_axis1(g, alpha, n_iter)
    w = y * vt[None]
    return keys, y, w


def _fwd_kernel(e_ref, wk_ref, q_ref, vt_ref, out_ref, *, scale, alpha,
                n_iter):
    e = e_ref[:].astype(jnp.float32)
    _, _, w = _replay(e, wk_ref[:].astype(jnp.float32),
                      q_ref[:].astype(jnp.float32),
                      vt_ref[:].astype(jnp.float32), scale, alpha, n_iter)
    z = jnp.einsum("bfo,bfe->boe", w, e, preferred_element_type=jnp.float32)
    out_ref[:] = jnp.exp(z).astype(out_ref.dtype)


def _bwd_kernel(e_ref, dout_ref, wk_ref, q_ref, vt_ref,
                de_ref, dwk_ref, dq_ref, dvt_ref, *, scale, alpha, n_iter):
    e = e_ref[:].astype(jnp.float32)
    wk = wk_ref[:].astype(jnp.float32)
    q = q_ref[:].astype(jnp.float32)
    vt = vt_ref[:].astype(jnp.float32)
    dout = dout_ref[:].astype(jnp.float32)

    keys, y, w = _replay(e, wk, q, vt, scale, alpha, n_iter)
    z = jnp.einsum("bfo,bfe->boe", w, e, preferred_element_type=jnp.float32)
    dz = dout * jnp.exp(z)                                       # [BB,O,E]

    dw = jnp.einsum("boe,bfe->bfo", dz, e,
                    preferred_element_type=jnp.float32)          # [BB,F,O]
    ds = dw * vt[None]
    dg = _bisect_bwd_axis1(y, ds, alpha)                         # [BB,F,O]
    dkeys = jnp.einsum("bfo,od->bfd", dg, q,
                       preferred_element_type=jnp.float32) * scale

    de = (jnp.einsum("boe,bfo->bfe", dz, w,
                     preferred_element_type=jnp.float32)
          + jnp.einsum("bfd,ed->bfe", dkeys, wk,
                       preferred_element_type=jnp.float32))
    de_ref[:] = de.astype(de_ref.dtype)

    # Mosaic's matmul wants a single contracting dim: collapse (b,f) -> x
    bb, f, _ = e.shape
    dwk_t = jnp.einsum("xe,xd->ed", e.reshape(bb * f, -1),
                       dkeys.reshape(bb * f, -1),
                       preferred_element_type=jnp.float32)
    dq_t = jnp.einsum("xo,xd->od", dg.reshape(bb * f, -1),
                      keys.reshape(bb * f, -1),
                      preferred_element_type=jnp.float32) * scale
    dvt_t = jnp.sum(dw * y, axis=0)                              # [F,O]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwk_ref[:] = jnp.zeros_like(dwk_ref)
        dq_ref[:] = jnp.zeros_like(dq_ref)
        dvt_ref[:] = jnp.zeros_like(dvt_ref)

    dwk_ref[:] += dwk_t.astype(dwk_ref.dtype)
    dq_ref[:] += dq_t.astype(dq_ref.dtype)
    dvt_ref[:] += dvt_t.astype(dvt_ref.dtype)


def _interpret():
    return jax.default_backend() != "tpu"


def _row_bytes(f, o, e, dk, bwd):
    """Rough per-batch-row VMEM bytes at padded layout, for tile sizing."""
    fp = _pad_up(f, _SUBLANE)
    op = _pad_up(o, _LANE)
    ep = _pad_up(e, _LANE)
    dkp = _pad_up(dk, _LANE)
    fo = fp * op * 4
    boe = _pad_up(o, _SUBLANE) * ep * 4
    fwd = f * ep * 4 + f * dkp * 4 + 3 * fo + 2 * boe
    if not bwd:
        return fwd
    return fwd + 3 * fo + 2 * boe + f * ep * 4 + f * dkp * 4


def _block(b, f, o, e, dk, bwd):
    budget = _BWD_VMEM_BUDGET if bwd else _FWD_VMEM_BUDGET
    per_row = _row_bytes(f, o, e, dk, bwd)
    bb = 8
    for cand in (16, 32, 64, 128, 256):
        if cand * per_row <= budget and cand <= max(b, 8):
            bb = cand
    return bb


def _fwd_call(emb, wk, q, vt, scale, alpha, n_iter):
    b, f, e = emb.shape
    o, dk = q.shape
    bb = _block(b, f, o, e, dk, bwd=False)
    bp = _pad_up(b, bb)
    if bp != b:
        emb = jnp.pad(emb, ((0, bp - b), (0, 0), (0, 0)))
    kern = functools.partial(_fwd_kernel, scale=scale, alpha=alpha,
                             n_iter=n_iter)
    out = pl.pallas_call(
        kern,
        grid=(bp // bb,),
        in_specs=[
            pl.BlockSpec((bb, f, e), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e, dk), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((o, dk), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, o, e), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, o, e), jnp.float32),
        interpret=_interpret(),
    )(emb, wk, q, vt)
    return out[:b]


def _bwd_call(emb, wk, q, vt, dout, scale, alpha, n_iter):
    b, f, e = emb.shape
    o, dk = q.shape
    bb = _block(b, f, o, e, dk, bwd=True)
    bp = _pad_up(b, bb)
    if bp != b:
        emb = jnp.pad(emb, ((0, bp - b), (0, 0), (0, 0)))
        dout = jnp.pad(dout, ((0, bp - b), (0, 0), (0, 0)))
    kern = functools.partial(_bwd_kernel, scale=scale, alpha=alpha,
                             n_iter=n_iter)
    acc = lambda i: (0, 0)
    de, dwk, dq, dvt = pl.pallas_call(
        kern,
        grid=(bp // bb,),
        in_specs=[
            pl.BlockSpec((bb, f, e), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, o, e), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e, dk), acc, memory_space=pltpu.VMEM),
            pl.BlockSpec((o, dk), acc, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, o), acc, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb, f, e), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e, dk), acc, memory_space=pltpu.VMEM),
            pl.BlockSpec((o, dk), acc, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, o), acc, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, f, e), jnp.float32),
            jax.ShapeDtypeStruct((e, dk), jnp.float32),
            jax.ShapeDtypeStruct((o, dk), jnp.float32),
            jax.ShapeDtypeStruct((f, o), jnp.float32),
        ),
        interpret=_interpret(),
    )(emb, dout, wk, q, vt)
    return de[:b], dwk, dq, dvt


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _arm1h(emb, wk, query, vt, alpha, n_iter):
    scale = query.shape[-1] ** -0.5
    return _fwd_call(emb, wk, query, vt, scale, alpha, n_iter)


def _arm1h_fwd(emb, wk, query, vt, alpha, n_iter):
    return _arm1h(emb, wk, query, vt, alpha, n_iter), (emb, wk, query, vt)


def _arm1h_bwd(alpha, n_iter, res, dout):
    emb, wk, query, vt = res
    scale = query.shape[-1] ** -0.5
    de, dwk, dq, dvt = _bwd_call(emb, wk, query, vt, dout, scale, alpha,
                                 n_iter)
    return (de.astype(emb.dtype), dwk.astype(wk.dtype),
            dq.astype(query.dtype), dvt.astype(vt.dtype))


_arm1h.defvjp(_arm1h_fwd, _arm1h_bwd)


def arm1h_fused(emb, wk, query, values, alpha, n_iter=50):
    """Fused ARM-1h interaction: emb [B,F,E], wk [E,dk], query [O,dk],
    values [O,F] -> exp-cross output [B,O,E] (f32). alpha must be a static
    python float > 1 (the kernel specializes on it)."""
    alpha = float(alpha)
    if alpha <= 1.0:
        raise ValueError("arm1h_fused requires alpha > 1 (softmax path is "
                         "handled by the jnp twin)")
    in_dtype = jnp.asarray(emb).dtype     # compute f32 inside the kernel,
    emb = jnp.asarray(emb, jnp.float32)   # but honor the caller's compute
    vt = jnp.asarray(values, jnp.float32).T           # [F,O]
    out = _arm1h(emb, jnp.asarray(wk, jnp.float32),
                 jnp.asarray(query, jnp.float32), vt, alpha, int(n_iter))
    # dtype contract parity with the jnp twin: under --bf16 the twin returns
    # bf16 and every downstream layer follows its input dtype — an f32
    # return here would silently run the whole head in f32
    return out.astype(in_dtype)


def arm1h_reference(emb, wk, query, values, alpha, n_iter=50):
    """jnp twin (same math through ops.*; differentiable via their VJPs)."""
    from armnet_tpu.ops.entmax import sparse_normalizer
    from armnet_tpu.ops.interaction import arm_attention_1h, arm_exp_cross

    keys = jnp.einsum("bfe,ed->bfd", emb, wk)
    w = arm_attention_1h(keys, query, values,
                         sparse_normalizer(alpha, n_iter=n_iter))
    return arm_exp_cross(emb, w)
