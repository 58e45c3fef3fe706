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

BUCKET = 1024     # table rows per grid step (output block height)
CHUNK = 256       # update rows consumed per inner iteration
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
        # two-term bf16 split (hi + residual): 2 DEFAULT MXU passes instead
        # of HIGHEST's 6, ~1e-5 relative accuracy on the raw gradient values
        # (the one-hot operand is bf16-exact, so the split is exact in it)
        g_all = win[:e, :]
        g_hi = g_all.astype(jnp.bfloat16).astype(jnp.float32)
        dn = (((1,), (1,)), ((), ()))                      # [BUCKET, e]
        return (acc
                + jax.lax.dot_general(onehot, g_hi, dn,
                                      preferred_element_type=jnp.float32)
                + jax.lax.dot_general(onehot, g_all - g_hi, dn,
                                      preferred_element_type=jnp.float32))

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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # sorted payload (HBM)
        ],
        out_specs=pl.BlockSpec((BUCKET, e), lambda i, starts: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ep, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    # out_shape is the exact row count: Pallas masks the last block's
    # out-of-bounds rows, and an [rp, e] + out[:nrows] slice would copy the
    # whole padded table (measured 3.3 ms at Criteo scale)
    out = pl.pallas_call(
        functools.partial(_kernel, n=n, e=e),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrows, e), jnp.float32),
        interpret=interpret,
    )(starts, payload)
    return out


def table_grad(g, flat_ids, nrows):
    """Scatter-add g [N,E] into a zero [nrows,E] table at flat_ids [N],
    duplicate-safe. Dispatches to the bucketed densify kernel on TPU."""
    if jax.default_backend() == "tpu" and nrows < 2 ** 24:
        return _table_grad_tpu(g, flat_ids, nrows)
    return table_grad_reference(g, flat_ids, nrows)
