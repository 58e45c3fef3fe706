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


def _wrap_negative_ids(flat_ids, nrows):
    """Index-normalization parity with the jnp twin and the forward gather:
    .at[].add and jnp.take wrap ids in [-nrows, 0) python-style, but the
    bucketed kernels' searchsorted ranges start at 0, so an unwrapped
    negative id's gradient row would be silently DROPPED on TPU while CPU
    (twin) adds it to row nrows+id. Ids below -nrows stay negative (kernel
    drops them; their forward rows were NaN-filled anyway)."""
    return jnp.where(flat_ids < 0, flat_ids + nrows, flat_ids)


def _sorted_prep(flat_ids, nrows, bucket):
    """Group the N updates by table bucket: returns (order, sid, starts) with
    `order` a permutation grouping ids by id//bucket, `sid` the permuted ids,
    and `starts` the [nb+1] per-bucket ranges in the permuted array.

    Default (cosort): one variadic lax.sort co-sorting (ids, iota) returns
    BOTH the sorted ids and the grouping permutation. The r1/r2 code did
    argsort(ids) and then gathered ids[order] — but on v5e the [N] gather
    costs ~1 ms (more than the whole sort, measured r3); the sort op always
    computes the sorted keys anyway, so asking for them is free.
    ARMNET_SCATTER_PREP=argsort restores the original for A/B."""
    n = flat_ids.shape[0]
    nb = -(-nrows // bucket)
    ids32 = flat_ids.astype(jnp.int32)
    edges = jnp.arange(nb + 1, dtype=jnp.int32)
    if os.environ.get("ARMNET_SCATTER_PREP", "cosort") == "argsort":
        order = jnp.argsort(ids32)
        sid = ids32[order]
    else:
        sid, order = lax.sort(
            (ids32, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    starts = jnp.searchsorted(sid, edges * bucket).astype(jnp.int32)
    return order, sid, starts


def _prep_bf16_payload(g, order, sid, n, e):
    """Shared v4/v5/v6 host-side prep: bf16 hi|residual payload [ep, np_]
    (sublane-tiled, lane-aligned) + broadcast id row [8, np_] with -1 pads.

    bf16 hi|residual split BEFORE the gather/transpose (half the bytes);
    reduce_precision, not a cast round-trip — see the v3 note on
    --xla_allow_excess_precision eliding fused downcasts. One definition so
    a numerics fix can't silently diverge across the three variants."""
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


def _kernel(starts_ref, payload_hbm, out_ref, pay_scr, sems, *, n, e):
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
    # WIN must stay a 128-multiple: the end-of-array clamp aligns the
    # window offset DOWN, and a ragged window would then end before the
    # final valid positions — silently dropping tail updates
    assert CHUNK % ALIGN == 0, "ARMNET_SCATTER_CHUNK must be a multiple of 128"
    order, sid, starts = _sorted_prep(flat_ids, nrows, BUCKET)
    sg = g[order].astype(jnp.float32)
    nb = -(-nrows // BUCKET)

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
            pl.BlockSpec(memory_space=pl.ANY),      # sorted payload (HBM)
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
# v4: v1's bucketed densify with a bf16 hi|residual payload and a separate
# int32 id row. Same output/block structure and dot orientation as v1; the
# differences are pure traffic/VPU savings:
#   * the transposed payload is bf16 [2e, N] (hi rows | residual rows) —
#     half the host-side transpose relayout and half the window DMA bytes
#     (the MXU's DEFAULT f32 dot rounds to bf16 anyway, so numerics are
#     identical; the split uses lax.reduce_precision — see v3's note);
#   * ids ride their own [8, N] int32 array (bf16 cannot hold them), so
#     the kernel skips the in-window f32->int cast and bf16 split.
# ---------------------------------------------------------------------------


def _kernel_v4(starts_ref, payload_hbm, idrow_hbm, out_ref, pay_scr, id_scr,
               sems, *, n, e):
    b = pl.program_id(0)
    start = starts_ref[b]
    end = starts_ref[b + 1]
    nchunks = (end - start + CHUNK - 1) // CHUNK
    base = b * BUCKET
    rows = lax.broadcasted_iota(jnp.int32, (BUCKET, WIN), 0)  # bucket slots

    def body(j, acc):
        off = start + j * CHUNK
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
        valid = (pos >= off) & (pos < jnp.minimum(off + CHUNK, end))
        local = id_scr[0:1, :] - base                       # [1, WIN]

        onehot = jnp.where((rows == local) & valid, 1.0, 0.0)
        # hi|residual rows come pre-split in bf16; one DEFAULT dot does
        # both MXU passes, halves summed on the VPU (v1's layout note)
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


# ---------------------------------------------------------------------------
# v5: v4 with a TRANSPOSED [e, nrows] output.
#
# v4's [nrows, e] output block lives in the T(8,128) tiling: at e=10 the
# minor dim pads to 128 lanes, so each of the ~1000 per-bucket output
# writes moves 12.8x the logical bytes (~1 GB/step of write traffic for an
# 84 MB gradient) — consistent with the r2 BUCKET sweep where HALVING the
# dot work (BUCKET 2048 -> 1024) made the kernel SLOWER (more grid steps =
# more padded output DMAs). v5 emits [e, BUCKET] blocks instead: BUCKET
# rides the lane axis dense, e pads only 10 -> 16 sublanes (1.6x). Same
# payload, same prep, same one-hot; the dot just swaps operand roles —
# out2 [2e, BUCKET] = dot(g2 [2e, WIN], onehot [BUCKET, WIN]) contracting
# both lane axes, the exact A.B^T orientation v1/v4 already lower fast
# (only sublane-sublane contraction is the slow Mosaic form, see v2).
# The flat row-major gradient then needs one XLA transpose+flatten on the
# host side ([e, nrows] -> [nrows*e]) — measured against v4's padded
# write + reshape before switching any default.
# ---------------------------------------------------------------------------


def _kernel_v5(starts_ref, payload_hbm, idrow_hbm, out_ref, pay_scr, id_scr,
               sems, *, n, e):
    b = pl.program_id(0)
    start = starts_ref[b]
    end = starts_ref[b + 1]
    nchunks = (end - start + CHUNK - 1) // CHUNK
    base = b * BUCKET
    rows = lax.broadcasted_iota(jnp.int32, (BUCKET, WIN), 0)  # bucket slots

    def body(j, acc):
        off = start + j * CHUNK
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
        valid = (pos >= off) & (pos < jnp.minimum(off + CHUNK, end))
        local = id_scr[0:1, :] - base                       # [1, WIN]

        onehot = jnp.where((rows == local) & valid, 1.0, 0.0)
        g2 = pay_scr[:2 * e, :].astype(jnp.float32)         # [2e, WIN]
        dn = (((1,), (1,)), ((), ()))                       # [2e, BUCKET]
        out2 = jax.lax.dot_general(g2, onehot, dn,
                                   preferred_element_type=jnp.float32)
        return acc + out2

    acc = lax.fori_loop(0, nchunks, body,
                        jnp.zeros((2 * e, BUCKET), jnp.float32))
    out_ref[:] = (acc[:e] + acc[e:]).astype(out_ref.dtype)


def _table_grad_tpu_v5(g, flat_ids, nrows, interpret=False):
    """Transposed densify: returns the [e, nrows] gradient (see v5 note)."""
    n, e = g.shape
    assert nrows < 2 ** 24
    assert CHUNK % ALIGN == 0, "ARMNET_SCATTER_CHUNK must be a multiple of 128"
    order, sid, starts = _sorted_prep(flat_ids, nrows, BUCKET)
    nb = -(-nrows // BUCKET)
    rp = nb * BUCKET
    payload, idrow, ep, np_ = _prep_bf16_payload(g, order, sid, n, e)

    # unlike v4's row-blocked output, the lane axis here is the TABLE axis:
    # the final block would be ragged at nrows % BUCKET, so pad the lane dim
    # to whole buckets and slice after (the pad is lanes, not 12.8x rows)
    out_spec = pl.BlockSpec((e, BUCKET), lambda i, starts: (0, i),
                            memory_space=pltpu.VMEM)
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
    out = pl.pallas_call(
        functools.partial(_kernel_v5, n=np_, e=e),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, rp), jnp.float32),
        interpret=interpret,
    )(starts, payload, idrow)
    return out[:, :nrows]


# ---------------------------------------------------------------------------
# v6: v5 with G buckets per grid program and all chunk-0 DMAs issued
# UP FRONT.
#
# The r3 roofline puts the v4 kernel 8.6x off its algorithmic floor with
# the dots (~0.3 ms MXU) and writes (~0.16 ms HBM post-v5) both cheap —
# the suspect is per-bucket fixed cost: ~1027 grid programs each paying a
# serial start/wait round-trip for a ~20 KB window DMA (plus grid
# bookkeeping). r2's double-buffer attempt attacked the wrong axis
# (chunks WITHIN a bucket, where nchunks is usually 1, so the dummy-chunk
# padding it needed cost more than it hid). v6 batches ACROSS buckets:
# one program owns G consecutive buckets, issues all 2G chunk-0 copies
# (payload + id row per bucket) before waiting on any, then walks the
# buckets in order — bucket g's dot overlaps buckets g+1..G-1's DMAs, so
# a program pays ~1 DMA latency instead of G. FLOPs are unchanged (one
# [2e, WIN] x [BUCKET, WIN] dot per chunk — NOT the G-fold larger dot a
# BUCKET*G sweep pays), the output block is [e, G*BUCKET] (same 1.6x
# sublane pad as v5), and grid length drops G-fold. Multi-chunk buckets
# (count > CHUNK) fall back to v5's serial DMA loop for chunks 1.. —
# rare at Criteo shapes (mean bucket count ~156 < CHUNK).
# ---------------------------------------------------------------------------

G6 = int(os.environ.get("ARMNET_SCATTER_G", 8))  # buckets per grid program


def _kernel_v6(starts_ref, payload_hbm, idrow_hbm, out_ref, pay_scr, id_scr,
               sems, *, n, e, g_per):
    pid = pl.program_id(0)
    b0 = pid * g_per
    rows = lax.broadcasted_iota(jnp.int32, (BUCKET, WIN), 0)  # bucket slots

    def window_copies(g, off_a):
        cp1 = pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(off_a, WIN)], pay_scr.at[g],
            sems.at[2 * g])
        cp2 = pltpu.make_async_copy(
            idrow_hbm.at[:, pl.ds(off_a, WIN)], id_scr.at[g],
            sems.at[2 * g + 1])
        return cp1, cp2

    def aligned(off):
        off_c = jnp.minimum(off, n - WIN)
        return pl.multiple_of(off_c - lax.rem(off_c, ALIGN), ALIGN)

    # phase 1: launch every bucket's chunk-0 window before waiting on any
    inflight = []
    for g in range(g_per):
        off_a = aligned(starts_ref[b0 + g])
        cp1, cp2 = window_copies(g, off_a)
        cp1.start()
        cp2.start()
        inflight.append((cp1, cp2, off_a))

    # phase 2: walk buckets in order; bucket g's densify overlaps the
    # still-inflight copies of buckets g+1..
    for g in range(g_per):
        start = starts_ref[b0 + g]
        end = starts_ref[b0 + g + 1]
        base = (b0 + g) * BUCKET

        def densify(off, off_a):
            pos = off_a + lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
            valid = (pos >= off) & (pos < jnp.minimum(off + CHUNK, end))
            local = id_scr[g, 0:1, :] - base                # [1, WIN]
            onehot = jnp.where((rows == local) & valid, 1.0, 0.0)
            g2 = pay_scr[g, :2 * e, :].astype(jnp.float32)  # [2e, WIN]
            dn = (((1,), (1,)), ((), ()))                   # [2e, BUCKET]
            return jax.lax.dot_general(g2, onehot, dn,
                                       preferred_element_type=jnp.float32)

        cp1, cp2, off_a0 = inflight[g]
        cp1.wait()
        cp2.wait()
        acc = densify(start, off_a0)

        # rare tail: buckets with more than CHUNK updates reuse slot g
        # serially (its chunk-0 copy is done, the semaphores are free)
        nchunks = (end - start + CHUNK - 1) // CHUNK

        def body(j, acc):
            off = start + j * CHUNK
            off_a = aligned(off)
            c1, c2 = window_copies(g, off_a)
            c1.start()
            c2.start()
            c1.wait()
            c2.wait()
            return acc + densify(off, off_a)

        acc = lax.fori_loop(1, nchunks, body, acc)
        out_ref[:, g * BUCKET:(g + 1) * BUCKET] = (
            acc[:e] + acc[e:]).astype(out_ref.dtype)


def _table_grad_tpu_v6(g, flat_ids, nrows, interpret=False):
    """v6 grouped-DMA densify: returns the [e, nrows] gradient (see note)."""
    n, e = g.shape
    assert nrows < 2 ** 24
    assert CHUNK % ALIGN == 0, "ARMNET_SCATTER_CHUNK must be a multiple of 128"
    g_per = G6
    nb = -(-nrows // BUCKET)
    ngroups = -(-nb // g_per)
    rp = ngroups * g_per * BUCKET
    # prep against the group-padded bucket count so starts has an entry for
    # every bucket every program touches (padding buckets are empty ranges)
    order, sid, starts = _sorted_prep(flat_ids, rp, BUCKET)
    payload, idrow, ep, np_ = _prep_bf16_payload(g, order, sid, n, e)

    out_spec = pl.BlockSpec((e, g_per * BUCKET), lambda i, starts: (0, i),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # bf16 payload (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # id row (HBM)
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((g_per, ep, WIN), jnp.bfloat16),
            pltpu.VMEM((g_per, 8, WIN), jnp.int32),
            pltpu.SemaphoreType.DMA((2 * g_per,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_v6, n=np_, e=e, g_per=g_per),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, rp), jnp.float32),
        interpret=interpret,
    )(starts, payload, idrow)
    return out[:, :nrows]


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
# same hazard as v1/v3's CHUNK % ALIGN assert: a non-8-aligned WIN2 makes
# the end-of-array clamp produce a window ending before n, silently
# dropping the final updates
assert CHUNK2 % 8 == 0, "ARMNET_SCATTER_CHUNK2 must be a multiple of 8"
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

    order, sid, starts = _sorted_prep(flat_ids, nrows, bucket)
    sg = g[order].astype(jnp.float32)
    nb = -(-nrows // bucket)

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
            pl.BlockSpec(memory_space=pl.ANY),      # payload (HBM)
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


# ---------------------------------------------------------------------------
# v3: the production flat-layout densify — v2's digit-factorized exact-tiled
# output with the dot in the fast A·B orientation and a row-major payload.
#
# What each predecessor got wrong, fixed here:
#   * v1 writes a [nrows, e] block output: XLA tiles it T(8,128), so at e=10
#     every write (and the downstream reshape to the flat optimizer layout)
#     moves 12.8x the logical bytes — ~2.5 ms/step of pure layout tax.
#   * v2's exact-tiled output needed out[group, slot*e+c]; it built the
#     one-hot with the window axis on SUBLANES of both dot operands (A^T B),
#     the one contraction form Mosaic lowers ~5x slow.
#   * v1's payload travels transposed [16, N]; the host-side [N,e] -> [e,N]
#     relayout costs ~1 ms at the Criteo shape.
#
# v3 keeps the window axis on the LANES of the one-hot lhs (ids ride a
# separate lane-major [8, N] int32 row so no in-kernel transpose is needed)
# and on the SUBLANES of the rhs (row-major payload window) — the native
# "A·B" MXU form. The rhs encodes the slot digit by placing each update's
# gradient row in its slot's lane range (pltpu.repeat + mask); hi|residual
# bf16 halves stack on the lane axis so ONE dot does both MXU passes. The
# payload itself is bf16 (hi | lo | slot columns): the MXU's DEFAULT f32
# path rounds operands to bf16 anyway, so splitting on the host is
# numerically identical and halves payload HBM traffic.
#
# Output block [128 groups, k*e lanes] with k = 128/gcd(e,128): k*e is a
# 128-multiple, so the block is exactly tiled — reshape(-1) of the result IS
# the row-major flat gradient, with zero padding anywhere.
# ---------------------------------------------------------------------------

CHUNK3 = int(os.environ.get("ARMNET_SCATTER_CHUNK3", 256))
ALIGN3 = 128                  # lane-window alignment for the id-row DMA
WIN3 = CHUNK3 + ALIGN3
MAX_KE3 = 2048                # rhs lane width cap (VMEM): k*e above this -> v1


def _kernel_v3(starts_ref, payload_hbm, idrow_hbm, out_ref, pay0, pay1,
               id0, id1, sems, *, n, e, k):
    b = pl.program_id(0)
    start = starts_ref[b]
    end = starts_ref[b + 1]
    nchunks = (end - start + CHUNK3 - 1) // CHUNK3
    base = b * (128 * k)
    logk = max(k.bit_length() - 1, 0)     # k is a power of two
    ke = k * e
    group_sub = lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    slot_lane = (lax.broadcasted_iota(jnp.int32, (1, ke), 1) // e).astype(
        jnp.float32)
    bufs = ((pay0, id0, 0), (pay1, id1, 1))

    def aligned_off(j):
        off = start + j * CHUNK3
        # clamp so the window fits in [0, n), then 128-align the offset (the
        # id-row DMA slices the lane axis); n is padded to a 128-multiple
        off_c = jnp.minimum(jnp.maximum(off, 0), n - WIN3)
        return off, pl.multiple_of(off_c - lax.rem(off_c, ALIGN3), ALIGN3)

    def copies(j, buf):
        pay, ids, s = buf
        _, off_a = aligned_off(j)
        return (pltpu.make_async_copy(payload_hbm.at[pl.ds(off_a, WIN3), :],
                                      pay, sems.at[s, 0]),
                pltpu.make_async_copy(idrow_hbm.at[:, pl.ds(off_a, WIN3)],
                                      ids, sems.at[s, 1]))

    # Double-buffered window DMAs with STATIC buffer assignment (even chunks
    # -> buffer 0, odd -> buffer 1): chunk j+2 streams in while j computes.
    # The chunk loop runs a PAIR per iteration over an even-rounded count;
    # out-of-range chunk indices clamp to a legal window and mask to a
    # no-op, so every started DMA is waited (semaphores stay balanced
    # across grid steps). ~900 serial DMAs per call would otherwise expose
    # their latency end to end. ARMNET_SCATTER_DB=0 falls back to serial
    # start+wait per chunk (debug bisect).
    db = os.environ.get("ARMNET_SCATTER_DB", "1") == "1"
    nit = 2 * ((nchunks + 1) // 2)

    if db:
        @pl.when(nit > 0)
        def _():
            for cp in copies(0, bufs[0]):
                cp.start()

        @pl.when(nit > 1)
        def _():
            for cp in copies(1, bufs[1]):
                cp.start()

    def compute(j, buf, acc):
        pay, ids, _ = buf
        if not db:
            for cp in copies(j, buf):
                cp.start()
        for cp in copies(j, buf):
            cp.wait()

        # load this chunk's window out of the buffer BEFORE starting the
        # j+2 prefetch into the same buffer (the prefetch write must not
        # overtake these reads)
        local = ids[0:1, :] - base                          # [1, WIN3]
        g_hi = pay[:, :e].astype(jnp.float32)
        g_lo = pay[:, e:2 * e].astype(jnp.float32)
        slot_col = pay[:, 2 * e:2 * e + 1].astype(jnp.float32)

        if db:
            @pl.when(j + 2 < nit)
            def _():
                for cp in copies(j + 2, buf):
                    cp.start()

        # lhs [128, WIN3]: group one-hot, window on LANES. Only this chunk's
        # own range [off, min(off+CHUNK3, end)) is valid — the alignment
        # shift, the end-of-array clamp and the padded pair-chunk all re-read
        # handled positions, masked off here.
        off, off_a = aligned_off(j)
        pos = off_a + lax.broadcasted_iota(jnp.int32, (1, WIN3), 1)
        valid = (pos >= off) & (pos < jnp.minimum(off + CHUNK3, end))
        grp = lax.shift_right_arithmetic(local, jnp.int32(logk))
        # mask/select arithmetic stays f32: Mosaic lowers neither bf16
        # compares (packed cmpf -> i1) nor i1 relayouts into bf16 selects;
        # the bf16 payload is upcast per window (cheap — VMEM resident)
        lhs = jnp.where((grp == group_sub) & valid, 1.0, 0.0)  # [128, WIN3]

        # rhs [WIN3, 2*k*e]: each update's gradient row placed in its slot's
        # lane range; hi | residual halves side by side (one dot, two terms).
        # Invalid window rows may land anywhere — lhs zeroes them in the dot.
        m = slot_col == slot_lane                           # [WIN3, ke]
        rhs = jnp.concatenate(
            [jnp.where(m, pltpu.repeat(g_hi, k, 1), 0.0),
             jnp.where(m, pltpu.repeat(g_lo, k, 1), 0.0)],
            axis=1)                                         # [WIN3, 2ke]

        dn = (((1,), (0,)), ((), ()))                       # A·B form
        out2 = jax.lax.dot_general(lhs, rhs, dn,
                                   preferred_element_type=jnp.float32)
        return acc + out2[:, :ke] + out2[:, ke:]

    def pair(p, acc):
        acc = compute(2 * p, bufs[0], acc)
        return compute(2 * p + 1, bufs[1], acc)

    acc = lax.fori_loop(0, nit // 2, pair,
                        jnp.zeros((128, ke), jnp.float32))
    out_ref[:] = acc


def _table_grad_tpu_v3(g, flat_ids, nrows, interpret=False):
    """Flat-layout densify: returns the row-major [nrows*e] gradient."""
    import math

    n, e = g.shape
    k = 128 // math.gcd(e, 128)
    bucket = 128 * k
    assert k * e <= MAX_KE3 and 2 * e + 1 <= 128
    # see _table_grad_tpu: a ragged window drops tail updates at the clamp
    assert CHUNK3 % ALIGN3 == 0, \
        "ARMNET_SCATTER_CHUNK3 must be a multiple of 128"

    order, sid, starts = _sorted_prep(flat_ids, nrows, bucket)
    nb = -(-nrows // bucket)

    # row-major bf16 payload [N_pad, 128]: hi | residual | slot digit | zero
    # pad to a full lane tile (Mosaic rejects narrow-minor-dim DMA slices).
    # slot = id mod k < 128 is bf16-exact; the group digit needs full id
    # range, so it rides a separate lane-major int32 row (idrow) for the lhs.
    # Built BEFORE the sort gather so the reorder moves half the bytes
    # (one bf16 gather instead of an f32 gather + a second build pass).
    # reduce_precision, not a bf16 round-trip cast: under
    # --xla_allow_excess_precision XLA may elide the downcast inside a
    # fused chain, silently zeroing the residual column (measured 2e-2
    # error on TPU); reduce_precision's rounding is semantically required.
    gf = g.astype(jnp.float32)
    hi = lax.reduce_precision(gf, 8, 7)         # bf16-valued, f32 dtype
    lo = (gf - hi).astype(jnp.bfloat16)
    hi = hi.astype(jnp.bfloat16)                # exact: already bf16-valued
    slot = jnp.bitwise_and(flat_ids.astype(jnp.int32), k - 1
                           ).astype(jnp.bfloat16)
    payload = jnp.concatenate(
        [hi, lo, slot[:, None],
         jnp.zeros((n, 128 - 2 * e - 1), jnp.bfloat16)], axis=1)[order]
    np_ = max(WIN3, -(-n // ALIGN3) * ALIGN3)
    if np_ != n:
        payload = jnp.concatenate(
            [payload, jnp.zeros((np_ - n, 128), jnp.bfloat16)], axis=0)
    # padded ids -1: negative group never matches; valid mask excludes anyway
    idrow = jnp.broadcast_to(
        jnp.concatenate([sid, jnp.full((np_ - n,), -1, jnp.int32)])[None, :],
        (8, np_))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # payload (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # id row (HBM)
        ],
        out_specs=pl.BlockSpec((128, k * e), lambda i, starts: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WIN3, 128), jnp.bfloat16),      # double buffer 0
            pltpu.VMEM((WIN3, 128), jnp.bfloat16),      # double buffer 1
            pltpu.VMEM((8, WIN3), jnp.int32),
            pltpu.VMEM((8, WIN3), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    # exact-tiled output: [row groups, k*e]; the ragged last group (when
    # nrows % k != 0) is masked by Pallas and sliced off after the flatten
    ng = -(-nrows // k)
    out = pl.pallas_call(
        functools.partial(_kernel_v3, n=np_, e=e, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ng, k * e), jnp.float32),
        interpret=interpret,
    )(starts, payload, idrow)
    return out.reshape(-1)[:nrows * e]


def table_grad(g, flat_ids, nrows):
    """Scatter-add g [N,E] into a zero [nrows,E] table at flat_ids [N],
    duplicate-safe. Dispatches to the bucketed densify kernel on TPU.

    ARMNET_SCATTER=xla forces the exact-f32 XLA scatter everywhere — the
    debugging escape hatch for parity regressions (the kernel's bf16
    hi|residual MXU split carries ~1e-5 relative error; XLA's scatter is
    exact but serializes row-at-a-time on TPU, 16+ ms at Criteo scale).
    v4 (bf16 payload) is the default; ARMNET_SCATTER=v1 selects the f32
    payload original (bitwise-identical results, ~3% slower step)."""
    which = os.environ.get("ARMNET_SCATTER", "v4")
    if (jax.default_backend() == "tpu" and nrows < 2 ** 24
            and which != "xla"):
        flat_ids = _wrap_negative_ids(flat_ids, nrows)
        if which == "v1":
            return _table_grad_tpu(g, flat_ids, nrows)
        if which == "v5":
            return _table_grad_tpu_v5(g, flat_ids, nrows).T
        if which == "v6":
            return _table_grad_tpu_v6(g, flat_ids, nrows).T
        return _table_grad_tpu_v4(g, flat_ids, nrows)
    return table_grad_reference(g, flat_ids, nrows)


def table_grad_flat(g, flat_ids, nrows):
    """Like table_grad but returns the row-major FLAT [nrows*E] gradient —
    the layout of flat-stored tables (ops/embedding.py).

    Dispatch: v4 (v1's layout with a bf16 hi|residual payload and a
    separate id row — bitwise-identical numerics, ~3% faster step) is the
    production default, by A/B measurement. ARMNET_SCATTER={v1,v2,v3,v4,
    v5,xla} overrides: v1 is the f32-payload original; v5 is v4 with a
    transposed [e, nrows] output (1.6x sublane pad instead of 12.8x lane
    pad on every bucket write) plus one host-side transpose+flatten;
    v2/v3 are the digit-factorized exact-tiled-output kernels kept as
    testbeds — v3
    fixed v2's slow A^T B dot orientation and drops the host transpose,
    but its slot-expansion rhs build ([WIN, 2*k*e] mask+repeat per chunk)
    is VPU-bound and nets out SLOWER in the full train step (15.7 ms vs
    13.9, r2 measurements in BENCH_NOTES.md); xla is the exact-f32
    scatter escape hatch for numerics debugging."""
    import math

    if (jax.default_backend() == "tpu" and nrows < 2 ** 24
            and os.environ.get("ARMNET_SCATTER") != "xla"):
        e = g.shape[1]
        which = os.environ.get("ARMNET_SCATTER", "v4")
        flat_ids = _wrap_negative_ids(flat_ids, nrows)
        if which == "v2" and e <= 120:
            return _table_grad_tpu_v2(g, flat_ids, nrows)
        if which == "v3" and (128 // math.gcd(e, 128)) * e <= MAX_KE3 \
                and 2 * e + 1 <= 128:
            return _table_grad_tpu_v3(g, flat_ids, nrows)
        if which == "v1":
            return _table_grad_tpu(g, flat_ids, nrows).reshape(-1)
        if which == "v5":
            # [e, nrows] -> flat row-major: one transpose+flatten (XLA
            # fuses the bucket-pad slice into the same copy)
            return _table_grad_tpu_v5(g, flat_ids, nrows).T.reshape(-1)
        if which == "v6":
            # v5's transposed layout with G buckets per program and
            # overlapped window DMAs (see v6 note)
            return _table_grad_tpu_v6(g, flat_ids, nrows).T.reshape(-1)
        return _table_grad_tpu_v4(g, flat_ids, nrows).reshape(-1)
    return table_grad_reference(g, flat_ids, nrows).reshape(-1)
