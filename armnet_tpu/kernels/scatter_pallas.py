"""Pallas TPU kernel for the embedding-table gradient (duplicate-index
scatter-add), the backward of the gather in every zoo model.

Why: XLA's scatter-add with possibly-duplicate dynamic indices serializes on
TPU — measured 16-18 ms for 160K row-updates into a [2.1M, 10] table, ~2/3
of the entire armnet_1h train step, and sorting/dedup does not help because
the scatter op itself is row-at-a-time.

Scheme (no scatter anywhere):
  1. sort the N updates by row id (bitonic argsort + payload gather, ~1 ms),
  2. bucket the table into contiguous row blocks of BUCKET rows; per-bucket
     update ranges come from one vectorized searchsorted,
  3. one grid step per bucket: DMA CHUNK-sized windows of the sorted updates
     from HBM, densify each window into the [BUCKET, E] block with a one-hot
     MXU matmul (duplicates accumulate naturally — no dedup pass needed),
     and write the block once, contiguously.

Layout/perf notes (v5e, measured):
  * the payload travels TRANSPOSED [16, N] (E grad rows + 1 id row + pad) so
    each DMA window is [16, CHUNK+128] with a 128-aligned offset — Mosaic's
    HBM slice tiling forbids narrow minor dims, and the row-major layout
    would cost an 11.6x padding amplification;
  * densify work is BUCKET x window x E MACs per bucket — CHUNK=256 keeps it
    ~4x under the first cut; the gradient operand uses a manual two-term
    bf16 split (2 DEFAULT MXU passes, ~1e-5 relative) because Mosaic lowers
    only DEFAULT (1 bf16 pass, rounds grads) or HIGHEST (6 passes) dots;
  * total chunk iterations = N/CHUNK + nbuckets regardless of id skew (the
    all-ids-equal worst case just concentrates chunks in one bucket's loop).

The jnp twin (plain .at[].add) is used off-TPU and in tests.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["table_grad", "table_grad_reference"]

import os

BUCKET = int(os.environ.get("ARMNET_SCATTER_BUCKET", 2048))  # table rows per grid step
CHUNK = int(os.environ.get("ARMNET_SCATTER_CHUNK", 256))     # updates per inner iter
ALIGN = 128       # window offset/shape alignment (HBM minor-dim tiling)
WIN = CHUNK + ALIGN


def table_grad_reference(g, flat_ids, nrows):
    """jnp twin: plain duplicate-index scatter-add."""
    return jnp.zeros((nrows, g.shape[1]), g.dtype).at[flat_ids].add(g)


def _kernel(starts_ref, payload_hbm, out_ref, pay_scr, sems, *, n, e):
    b = pl.program_id(0)
    start = starts_ref[b]
    end = starts_ref[b + 1]
    nchunks = (end - start + CHUNK - 1) // CHUNK
    base = b * BUCKET
    rows = lax.broadcasted_iota(jnp.int32, (BUCKET, WIN), 0)  # bucket slots

    def body(j, acc):
        off = start + j * CHUNK
        # clamp so the window fits in [0, n), then ALIGN the offset for the
        # DMA tiling; n is padded to a multiple of ALIGN so both hold and the
        # window still covers this chunk's range
        off_c = jnp.minimum(off, n - WIN)
        off_a = pl.multiple_of(off_c - lax.rem(off_c, ALIGN), ALIGN)
        cp = pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(off_a, WIN)], pay_scr, sems.at[0])
        cp.start()
        cp.wait()
        win = pay_scr[:]                                   # [ep, WIN]

        pos = off_a + lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
        # only THIS chunk's own range [off, off+CHUNK): the alignment shift
        # and the end-of-array clamp both re-read already-handled positions
        valid = (pos >= off) & (pos < jnp.minimum(off + CHUNK, end))
        # ids ride payload row `e` as exact f32 integers
        local = win[e, :].reshape(1, WIN).astype(jnp.int32) - base

        onehot = jnp.where((rows == local) & valid, 1.0, 0.0)
        # two-term bf16 split (hi + residual): DEFAULT MXU passes instead of
        # HIGHEST's 6, ~1e-5 relative accuracy on the raw gradient values
        # (the one-hot operand is bf16-exact, so the split is exact in it).
        # Both terms ride ONE dot: rhs [WIN, 2e] still sits inside the same
        # 128-lane output pad as [WIN, e], so stacking hi|residual on the
        # lane axis halves the MXU passes for free; the halves are summed
        # on the VPU afterwards.
        g_all = win[:e, :]
        g_hi = g_all.astype(jnp.bfloat16).astype(jnp.float32)
        g2 = jnp.concatenate([g_hi, g_all - g_hi], axis=0)  # [2e, WIN]
        dn = (((1,), (1,)), ((), ()))                       # [BUCKET, 2e]
        out2 = jax.lax.dot_general(onehot, g2, dn,
                                   preferred_element_type=jnp.float32)
        return acc + out2[:, :e] + out2[:, e:]

    acc = lax.fori_loop(0, nchunks, body,
                        jnp.zeros((BUCKET, e), jnp.float32))
    out_ref[:] = acc.astype(out_ref.dtype)


def _table_grad_tpu(g, flat_ids, nrows, interpret=False):
    n, e = g.shape
    assert nrows < 2 ** 24, "ids must be f32-exact (payload-row encoding)"
    order = jnp.argsort(flat_ids)
    sid = flat_ids[order].astype(jnp.int32)
    sg = g[order].astype(jnp.float32)

    rp = -(-nrows // BUCKET) * BUCKET
    nb = rp // BUCKET
    # per-bucket update ranges in the sorted id array
    starts = jnp.searchsorted(
        sid, (jnp.arange(nb + 1, dtype=jnp.int32) * BUCKET).astype(sid.dtype)
    ).astype(jnp.int32)

    # transposed payload [ep, N]: e gradient rows, the id as an
    # exact-integer f32 row, zero pad to a sublane multiple
    ep = -(-(e + 1) // 8) * 8
    payload = jnp.concatenate(
        [sg.T, sid[None, :].astype(jnp.float32),
         jnp.zeros((ep - e - 1, n), jnp.float32)], axis=0)
    np_ = max(WIN, -(-n // ALIGN) * ALIGN)   # window fit + offset alignment
    if np_ != n:
        # padded ids are -1: never match any bucket slot
        pad = jnp.zeros((ep, np_ - n), jnp.float32).at[e, :].set(-1.0)
        payload = jnp.concatenate([payload, pad], axis=1)
        n = np_

    out_spec = pl.BlockSpec((BUCKET, e), lambda i, starts: (i, 0),
                            memory_space=pltpu.VMEM)
    # out_shape is the exact row count: Pallas masks the last block's
    # out-of-bounds rows, and an [rp, e] + out[:nrows] slice would copy
    # the whole padded table (measured 3.3 ms at Criteo scale)
    out_shape = jax.ShapeDtypeStruct((nrows, e), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # sorted payload (HBM)
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((ep, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n=n, e=e),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(starts, payload)
    return out


# ---------------------------------------------------------------------------
# v2: grouped densify for FLAT-layout gradients.
#
# The v1 kernel's [nrows, e] output lives in XLA's T(8,128) tiling, where an
# e=10 minor dim pads to 128 lanes — every write (and the downstream reshape
# to the flat [R*E] optimizer layout) moves 12.8x the logical bytes, and the
# one-hot dot fills only e of 128 output lanes. v2 removes both taxes with a
# digit factorization of the one-hot: split each table row r into
# (group, slot) = (r // k, r % k) with k = 128/gcd(e, 128), and compute
#
#   out[group, slot*e + c] = sum_w [group(w) == group] * rhs[w, slot*e + c]
#   rhs[w, slot*e + c]     = [slot(w) == slot] * g[w, c]
#
# i.e. the dot's lhs selects the GROUP digit, the rhs encodes the SLOT digit
# by placing g's row in its slot's lane range. The output block is
# [128 groups, k*e lanes] — k*e is a 128-multiple, so the layout is exactly
# tiled (zero padding), the MXU runs at full lane occupancy, and
# reshape(-1) of the [G, k*e] result IS the row-major flat gradient.
#
# Payload is row-major [N, 128] (grads in cols 0..e-1, id as exact-int f32
# in col e) — no [e, N] transpose on the host side, windows are [WIN, 128]
# slices with 8-row-aligned offsets; a separate [1, N] id row feeds the lhs
# so neither operand needs an in-kernel transpose.
# ---------------------------------------------------------------------------

CHUNK2 = int(os.environ.get("ARMNET_SCATTER_CHUNK2", 256))
WIN2 = CHUNK2 + 8                       # row-offset alignment slop


def _kernel_v2(starts_ref, payload_hbm, out_ref, pay_scr, sems, *, n, e, k):
    b = pl.program_id(0)
    start = starts_ref[b]
    end = starts_ref[b + 1]
    nchunks = (end - start + CHUNK2 - 1) // CHUNK2
    bucket = 128 * k
    base = b * bucket

    g1_lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)       # groups
    slot_lane = lax.broadcasted_iota(jnp.int32, (1, k * e), 1) // e

    def body(j, acc):
        off = start + j * CHUNK2
        off_c = jnp.minimum(off, n - WIN2)
        off_a = pl.multiple_of(off_c - lax.rem(off_c, 8), 8)
        cp = pltpu.make_async_copy(
            payload_hbm.at[pl.ds(off_a, WIN2), :], pay_scr, sems.at[0])
        cp.start()
        cp.wait()

        # everything is sublane-oriented — no transpose anywhere; the dot
        # contracts the window axis as sublanes of BOTH operands (the native
        # "A^T B" MXU form)
        pos = off_a + lax.broadcasted_iota(jnp.int32, (WIN2, 1), 0)
        # only this chunk's own range: the alignment shift and the
        # end-of-array clamp both re-read already-handled rows
        valid = (pos >= off) & (pos < jnp.minimum(off + CHUNK2, end))
        local = pay_scr[:, e:e + 1].astype(jnp.int32) - base     # [WIN2, 1]

        # lhs: [WIN2, 128] group one-hot (masked)
        onehot = jnp.where((local // k == g1_lane) & valid, 1.0, 0.0)

        # rhs: [WIN2, k*e] slot-expanded gradient rows (no masking needed —
        # invalid rows hit all-zero one-hot rows)
        m = lax.rem(local, k) == slot_lane                       # [WIN2, k*e]
        g_all = pay_scr[:, :e]                                   # [WIN2, e]
        g_hi = g_all.astype(jnp.bfloat16).astype(jnp.float32)
        rhs_hi = jnp.where(m, pltpu.repeat(g_hi, k, 1), 0.0)
        rhs_lo = jnp.where(m, pltpu.repeat(g_all - g_hi, k, 1), 0.0)

        dn = (((0,), (0,)), ((), ()))                            # [128, k*e]
        return (acc
                + jax.lax.dot_general(onehot, rhs_hi, dn,
                                      preferred_element_type=jnp.float32)
                + jax.lax.dot_general(onehot, rhs_lo, dn,
                                      preferred_element_type=jnp.float32))

    acc = lax.fori_loop(0, nchunks, body,
                        jnp.zeros((128, k * e), jnp.float32))
    out_ref[:] = acc


def _table_grad_tpu_v2(g, flat_ids, nrows, interpret=False):
    """Flat-layout densify: returns the row-major [nrows*e] gradient."""
    import math

    n, e = g.shape
    assert nrows < 2 ** 24 and e <= 120
    k = 128 // math.gcd(e, 128)
    bucket = 128 * k

    order = jnp.argsort(flat_ids)
    sid = flat_ids[order].astype(jnp.int32)
    sg = g[order].astype(jnp.float32)

    nb = -(-nrows // bucket)
    starts = jnp.searchsorted(
        sid, (jnp.arange(nb + 1, dtype=jnp.int32) * bucket).astype(sid.dtype)
    ).astype(jnp.int32)

    # row-major payload [N_pad, 128]: grads | id | zeros; padded ids -1
    np_ = max(WIN2, -(-n // 8) * 8)
    payload = jnp.concatenate(
        [sg, sid[:, None].astype(jnp.float32),
         jnp.zeros((n, 128 - e - 1), jnp.float32)], axis=1)
    if np_ != n:
        payload = jnp.concatenate(
            [payload,
             jnp.zeros((np_ - n, 128), jnp.float32)
             .at[:, e].set(-1.0)], axis=0)
        n = np_

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # payload (HBM)
        ],
        out_specs=pl.BlockSpec((128, k * e), lambda i, starts: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WIN2, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    # exact-tiled output: [row groups, k*e]; the ragged last group (when
    # nrows % k != 0) is masked by Pallas and sliced off after the flatten
    ng = -(-nrows // k)
    out = pl.pallas_call(
        functools.partial(_kernel_v2, n=n, e=e, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ng, k * e), jnp.float32),
        interpret=interpret,
    )(starts, payload)
    return out.reshape(-1)[:nrows * e]


def table_grad(g, flat_ids, nrows):
    """Scatter-add g [N,E] into a zero [nrows,E] table at flat_ids [N],
    duplicate-safe. Dispatches to the bucketed densify kernel on TPU."""
    if jax.default_backend() == "tpu" and nrows < 2 ** 24:
        return _table_grad_tpu(g, flat_ids, nrows)
    return table_grad_reference(g, flat_ids, nrows)


def table_grad_flat(g, flat_ids, nrows):
    """Like table_grad but returns the row-major FLAT [nrows*E] gradient —
    the layout of flat-stored tables (ops/embedding.py).

    Dispatch note: the v2 grouped kernel (exact-tiled output, no padded
    [nrows, E] intermediate) is numerically verified on TPU (4.8e-6 rel)
    but measured 7.7 ms vs v1's 4.2 ms at the Criteo shape — its A^T B dot
    contracts over the sublane axis, which Mosaic lowers ~5x slower than a
    major-axis contraction (same pathology recorded in BENCH_NOTES.md), and
    that swamps the layout savings. v1 + XLA reshape stays the default;
    set ARMNET_SCATTER_V2=1 to flip (for future Mosaic versions)."""
    if jax.default_backend() == "tpu" and nrows < 2 ** 24:
        if os.environ.get("ARMNET_SCATTER_V2") == "1" and g.shape[1] <= 120:
            return _table_grad_tpu_v2(g, flat_ids, nrows)
        return _table_grad_tpu(g, flat_ids, nrows).reshape(-1)
    return table_grad_reference(g, flat_ids, nrows).reshape(-1)
