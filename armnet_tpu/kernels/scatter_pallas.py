"""Pallas TPU kernel for the embedding-table gradient (duplicate-index
scatter-add), the backward of the gather in every zoo model.

Why: XLA's scatter-add with possibly-duplicate dynamic indices serializes on
TPU — measured 16-18 ms for 160K row-updates into a [2.1M, 10] table, ~2/3
of the entire armnet_1h train step, and sorting/dedup does not help because
the scatter op itself is row-at-a-time.

Scheme (no scatter anywhere):
  1. co-sort the N updates by row id (one variadic lax.sort returns the
     sorted ids AND the grouping permutation, ~0.25 ms),
  2. bucket the table into contiguous row blocks of BUCKET rows; per-bucket
     update ranges come from one vectorized searchsorted,
  3. one grid step per bucket: DMA CHUNK-sized windows of the sorted updates
     from HBM, densify each window into the [BUCKET, E] block with a one-hot
     MXU matmul (duplicates accumulate naturally — no dedup pass needed),
     and write the block once, contiguously.

Layout/perf notes (v5e, measured):
  * the payload travels TRANSPOSED [2e, N] in bf16 (hi|residual gradient
    rows) plus a separate [8, N] int32 id row, so each DMA window is
    [*, CHUNK+128] with a 128-aligned offset — Mosaic's HBM slice tiling
    forbids narrow minor dims, and the row-major layout would cost an 11.6x
    padding amplification;
  * densify work is BUCKET x window x E MACs per bucket — CHUNK=256 keeps it
    ~4x under the first cut; the gradient operand's manual two-term bf16
    split (2 DEFAULT MXU passes, ~1e-5 relative) exists because Mosaic
    lowers only DEFAULT (1 bf16 pass, rounds grads) or HIGHEST (6 passes)
    dots;
  * total chunk iterations = N/CHUNK + nbuckets regardless of id skew (the
    all-ids-equal worst case just concentrates chunks in one bucket's loop).

This production kernel ("v4") won a three-round A/B campaign over five
alternative designs (f32 payload, digit-factorized exact-tiled outputs,
transposed [e, nrows] output blocks, grouped multi-bucket DMA overlap) and
two prep variants and a BUCKET/CHUNK grid — every loser, its design
rationale, and its measured numbers are recorded in TABLE_GRAD_ATTIC.md
next to this file (r5 sweep: v4 4.86 ms vs best-alternative 4.98 ms at the
Criteo shape; per-bucket DMA latency is the remaining floor).

The jnp twin (plain .at[].add) is used off-TPU and in tests.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["table_grad", "table_grad_flat", "table_grad_reference"]

BUCKET = int(os.environ.get("ARMNET_SCATTER_BUCKET", 2048))  # table rows per grid step
CHUNK = int(os.environ.get("ARMNET_SCATTER_CHUNK", 256))     # updates per inner iter
ALIGN = 128       # window offset/shape alignment (HBM minor-dim tiling)
WIN = CHUNK + ALIGN


def table_grad_reference(g, flat_ids, nrows):
    """jnp twin: plain duplicate-index scatter-add."""
    return jnp.zeros((nrows, g.shape[1]), g.dtype).at[flat_ids].add(g)


def _wrap_negative_ids(flat_ids, nrows):
    """Index-normalization parity with the jnp twin and the forward gather:
    .at[].add and jnp.take wrap ids in [-nrows, 0) python-style, but the
    bucketed kernel's searchsorted ranges start at 0, so an unwrapped
    negative id's gradient row would be silently DROPPED on TPU while CPU
    (twin) adds it to row nrows+id. Ids below -nrows stay negative (kernel
    drops them; their forward rows were NaN-filled anyway)."""
    return jnp.where(flat_ids < 0, flat_ids + nrows, flat_ids)


def _sorted_prep(flat_ids, nrows, bucket):
    """Group the N updates by table bucket: returns (order, sid, starts) with
    `order` a permutation grouping ids by id//bucket, `sid` the permuted ids,
    and `starts` the [nb+1] per-bucket ranges in the permuted array.

    One variadic lax.sort co-sorting (ids, iota) returns BOTH the sorted ids
    and the grouping permutation. argsort(ids) + ids[order] pays an extra
    [N]-row gather (~1 ms on v5e, more than the whole sort — r3 measured);
    the sort op computes the sorted keys regardless, so asking is free."""
    n = flat_ids.shape[0]
    nb = -(-nrows // bucket)
    ids32 = flat_ids.astype(jnp.int32)
    edges = jnp.arange(nb + 1, dtype=jnp.int32)
    sid, order = lax.sort(
        (ids32, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    starts = jnp.searchsorted(sid, edges * bucket).astype(jnp.int32)
    return order, sid, starts


def _prep_bf16_payload(g, order, sid, n, e):
    """Host-side prep: bf16 hi|residual payload [ep, np_] (sublane-tiled,
    lane-aligned) + broadcast id row [8, np_] with -1 pads.

    bf16 hi|residual split BEFORE the gather/transpose (half the bytes);
    reduce_precision, not a cast round-trip — a fused downcast can be elided
    under --xla_allow_excess_precision, silently re-widening the hi term."""
    gf = g.astype(jnp.float32)
    hi = lax.reduce_precision(gf, 8, 7)
    pair = jnp.concatenate([hi.astype(jnp.bfloat16),
                            (gf - hi).astype(jnp.bfloat16)], axis=1)
    payload = pair[order].T                    # [2e, N] bf16
    ep = -(-(2 * e) // 16) * 16                # bf16 sublane tile
    if ep != 2 * e:
        payload = jnp.concatenate(
            [payload, jnp.zeros((ep - 2 * e, n), jnp.bfloat16)], axis=0)
    np_ = max(WIN, -(-n // ALIGN) * ALIGN)
    if np_ != n:
        payload = jnp.concatenate(
            [payload, jnp.zeros((ep, np_ - n), jnp.bfloat16)], axis=1)
    # padded ids -1: never match a bucket slot
    idrow = jnp.broadcast_to(
        jnp.concatenate([sid, jnp.full((np_ - n,), -1, jnp.int32)])[None, :],
        (8, np_))
    return payload, idrow, ep, np_


def _kernel_v4(starts_ref, payload_hbm, idrow_hbm, out_ref, pay_scr, id_scr,
               sems, *, n, e):
    # NOTE (r2): a static double-buffered variant of this loop (prefetch
    # chunk j+2 while j computes, even/odd buffers, balanced semaphores)
    # was built and measured SLOWER in the full train step (16.6 ms vs
    # 13.9) — the pair-loop's dummy-chunk padding and the extra live DMA
    # cost more than the latency they hide; Mosaic already overlaps the
    # serial start/wait stream well enough. Keeping the simple form.
    b = pl.program_id(0)
    start = starts_ref[b]
    end = starts_ref[b + 1]
    nchunks = (end - start + CHUNK - 1) // CHUNK
    base = b * BUCKET
    rows = lax.broadcasted_iota(jnp.int32, (BUCKET, WIN), 0)  # bucket slots

    def body(j, acc):
        off = start + j * CHUNK
        # clamp so the window fits in [0, n), then ALIGN the offset for the
        # DMA tiling; n is padded to a multiple of ALIGN so both hold and
        # the window still covers this chunk's range
        off_c = jnp.minimum(off, n - WIN)
        off_a = pl.multiple_of(off_c - lax.rem(off_c, ALIGN), ALIGN)
        cp1 = pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(off_a, WIN)], pay_scr, sems.at[0])
        cp2 = pltpu.make_async_copy(
            idrow_hbm.at[:, pl.ds(off_a, WIN)], id_scr, sems.at[1])
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

        pos = off_a + lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
        # only THIS chunk's own range [off, off+CHUNK): the alignment shift
        # and the end-of-array clamp both re-read already-handled positions
        valid = (pos >= off) & (pos < jnp.minimum(off + CHUNK, end))
        local = id_scr[0:1, :] - base                       # [1, WIN]

        onehot = jnp.where((rows == local) & valid, 1.0, 0.0)
        # hi|residual rows come pre-split in bf16; one DEFAULT dot does
        # both MXU passes (rhs [WIN, 2e] sits inside the same 128-lane
        # output pad as [WIN, e]), halves summed on the VPU
        g2 = pay_scr[:2 * e, :].astype(jnp.float32)         # [2e, WIN]
        dn = (((1,), (1,)), ((), ()))                       # [BUCKET, 2e]
        out2 = jax.lax.dot_general(onehot, g2, dn,
                                   preferred_element_type=jnp.float32)
        return acc + out2[:, :e] + out2[:, e:]

    acc = lax.fori_loop(0, nchunks, body,
                        jnp.zeros((BUCKET, e), jnp.float32))
    out_ref[:] = acc.astype(out_ref.dtype)


def _table_grad_tpu_v4(g, flat_ids, nrows, interpret=False):
    n, e = g.shape
    assert nrows < 2 ** 24
    assert CHUNK % ALIGN == 0, "ARMNET_SCATTER_CHUNK must be a multiple of 128"
    order, sid, starts = _sorted_prep(flat_ids, nrows, BUCKET)
    nb = -(-nrows // BUCKET)
    payload, idrow, ep, np_ = _prep_bf16_payload(g, order, sid, n, e)

    out_spec = pl.BlockSpec((BUCKET, e), lambda i, starts: (i, 0),
                            memory_space=pltpu.VMEM)
    # out_shape is the exact row count: Pallas masks the last block's
    # out-of-bounds rows, and an [rp, e] + out[:nrows] slice would copy
    # the whole padded table (measured 3.3 ms at Criteo scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # bf16 payload (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # id row (HBM)
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((ep, WIN), jnp.bfloat16),
            pltpu.VMEM((8, WIN), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_v4, n=np_, e=e),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrows, e), jnp.float32),
        interpret=interpret,
    )(starts, payload, idrow)


def table_grad(g, flat_ids, nrows):
    """Scatter-add g [N,E] into a zero [nrows,E] table at flat_ids [N],
    duplicate-safe. Dispatches to the bucketed densify kernel on TPU.

    ARMNET_SCATTER=xla forces the exact-f32 XLA scatter everywhere — the
    debugging escape hatch for parity regressions (the kernel's bf16
    hi|residual MXU split carries ~1e-5 relative error; XLA's scatter is
    exact but serializes row-at-a-time on TPU, 16+ ms at Criteo scale)."""
    if (jax.default_backend() == "tpu" and nrows < 2 ** 24
            and os.environ.get("ARMNET_SCATTER") != "xla"):
        flat_ids = _wrap_negative_ids(flat_ids, nrows)
        return _table_grad_tpu_v4(g, flat_ids, nrows)
    return table_grad_reference(g, flat_ids, nrows)


def table_grad_flat(g, flat_ids, nrows):
    """Like table_grad but returns the row-major FLAT [nrows*E] gradient —
    the layout of flat-stored tables (ops/embedding.py)."""
    if (jax.default_backend() == "tpu" and nrows < 2 ** 24
            and os.environ.get("ARMNET_SCATTER") != "xla"):
        flat_ids = _wrap_negative_ids(flat_ids, nrows)
        return _table_grad_tpu_v4(g, flat_ids, nrows).reshape(-1)
    return table_grad_reference(g, flat_ids, nrows).reshape(-1)
