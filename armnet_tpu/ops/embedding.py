"""Value-scaled embedding-bag: the universal substrate of every zoo model.

Batch schema (kept from the reference, data_loader.py:20-23):
  ids:    int32  [B, F]   feature ids per field
  values: float  [B, F]   per-feature value scale (1.0 for one-hot fields)

lookup(table, ids, values) -> [B, F, E] = table[ids] * values[..., None]

TPU notes:
  * For large tables, `jnp.take` lowers to a dynamic-gather that XLA executes
    from HBM; this is the bandwidth-optimal path for nfeat >> B*F.
  * For tiny tables (nfeat <= ONE_HOT_MAX_ROWS) a one-hot matmul is faster on
    TPU: it rides the MXU and avoids the gather unit entirely.
  * The multi-chip row-sharded variant (lookup from a table sharded over the
    'model' mesh axis with collective combine) lives in
    armnet_tpu/parallel/embedding_parallel.py.
"""

import contextlib
import functools
import threading

import jax
import jax.numpy as jnp

__all__ = ["embedding_bag", "embedding_bag_flat",
           "scaled_embedding_lookup", "one_hot_embedding_bag",
           "sharded_lookup_context"]

# Active sharded-lookup context (set by the trainer when --shard_embedding is
# on). Thread-local so concurrent traces don't fight.
_ctx = threading.local()


@contextlib.contextmanager
def sharded_lookup_context(mesh, impl="psum", capacity_factor=2.0):
    """Route every scaled_embedding_lookup of a row-shardable table through
    the 'model'-axis sharded lookup (psum or a2a exchange) while active."""
    prev = getattr(_ctx, "cfg", None)
    _ctx.cfg = {"mesh": mesh, "impl": impl, "capacity_factor": capacity_factor}
    try:
        yield
    finally:
        _ctx.cfg = prev

# Below this many rows, one-hot matmul beats gather on TPU (table fits VMEM
# and the MXU does the select). Diabetes130 (369 rows) and similar land here.
ONE_HOT_MAX_ROWS = 512


def one_hot_embedding_bag(table, ids, values):
    """Embedding-bag as one-hot x table matmul (MXU path for tiny tables).

    Index semantics match jnp.take's defaults (one_hot alone would yield a
    SILENT zero row for any out-of-range id): negatives in [-n, 0) wrap
    python-style; ids outside [-n, n) yield NaN rows."""
    nfeat = table.shape[0]
    wrapped = jnp.where(ids < 0, ids + nfeat, ids)
    oh = jax.nn.one_hot(wrapped, nfeat, dtype=table.dtype)    # [B, F, nfeat]
    # HIGHEST precision: a one-hot select must be exact — the default bf16 MXU
    # pass would silently round the f32 table.
    emb = jnp.einsum(
        "bfn,ne->bfe", oh, table,
        preferred_element_type=table.dtype, precision=jax.lax.Precision.HIGHEST,
    )
    oob = (ids < -nfeat) | (ids >= nfeat)
    emb = jnp.where(oob[..., None], jnp.nan, emb)
    return emb * values[..., None].astype(table.dtype)


def _table_scatter_add(g, flat_ids, nrows):
    """Scatter-add g [N,E] into [nrows,E] at flat_ids [N] — duplicate-safe.
    Dispatches to the bucketed Pallas densify kernel on TPU (XLA's scatter
    serializes row-by-row there: 16+ ms for 160K updates into a 2.1M-row
    table); plain .at[].add elsewhere."""
    from armnet_tpu.kernels.scatter_pallas import table_grad

    return table_grad(g, flat_ids, nrows)


@jax.custom_vjp
def embedding_bag(table, ids, values):
    """Gather rows by id and scale by value: [B, F] -> [B, F, E].

    Custom VJP: the table gradient uses the sorted-segment scatter above
    instead of XLA's serialized duplicate-index scatter-add."""
    emb = jnp.take(table, ids, axis=0)                         # [B, F, E]
    return emb * values[..., None].astype(table.dtype)


def _bag_fwd(table, ids, values):
    return embedding_bag(table, ids, values), (table, ids, values)


def _bag_bwd(res, dout):
    import numpy as np

    table, ids, values = res
    emb = jnp.take(table, ids, axis=0)             # recompute: cheaper than
    dvalues = jnp.sum(                             # saving [B,F,E] residuals
        dout * emb, axis=-1).astype(values.dtype)
    g = (dout * values[..., None].astype(dout.dtype)).reshape(
        -1, table.shape[1])
    dtable = _table_scatter_add(
        g.astype(jnp.float32), ids.reshape(-1), table.shape[0])
    return (dtable.astype(table.dtype),
            np.zeros(ids.shape, jax.dtypes.float0), dvalues)


embedding_bag.defvjp(_bag_fwd, _bag_bwd)


def _flat_gather(flat_table, ids, nemb):
    """Gather rows from a FLAT [R*E] table: [B,F] ids -> [B,F,E].

    Why flat: XLA stores a [2.1M, 10] f32 table in T(8,128) tiling — the
    10-wide minor dim pads to 128 lanes, a 12.8x physical blowup that every
    full-table pass pays (the Adam update on the Criteo table alone measured
    11 ms/step). A flat [R*E] vector is unpadded, so the optimizer runs at
    true bandwidth (0.33 ms measured); only the gather pays one reshape view
    into the padded row layout (a 1-D lax.gather avoids the view but lowers
    to a serialized dynamic-slice loop — 150+ ms — so rows it is).

    (An explicit bf16 view was tried — XLA inserts its own bf16 table copy
    for DEFAULT-precision consumers — but measured 12% SLOWER end-to-end
    than letting XLA schedule the conversion itself.)"""
    table2d = flat_table.reshape(-1, nemb)
    return jnp.take(table2d, ids, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def embedding_bag_flat(flat_table, ids, values, nemb):
    """Value-scaled embedding-bag over a flat [R*E] table -> [B,F,E]."""
    emb = _flat_gather(flat_table, ids, nemb)
    return emb * values[..., None].astype(emb.dtype)


def _bag_flat_fwd(flat_table, ids, values, nemb):
    # save the gathered rows (B*F*E floats, ~6 MB) — recomputing them in the
    # bwd would rebuild the padded 2-D table view, a 1.6 ms relayout
    emb = _flat_gather(flat_table, ids, nemb)
    out = emb * values[..., None].astype(emb.dtype)
    # flat_table rides along only for its static shape/dtype (no data read)
    return out, (emb, ids, values, flat_table)


def _bag_flat_bwd(nemb, res, dout):
    import numpy as np

    emb, ids, values, flat_table = res
    flat_rows, tdtype = flat_table.shape[0], flat_table.dtype
    dvalues = jnp.sum(dout * emb, axis=-1).astype(values.dtype)
    g = (dout * values[..., None].astype(dout.dtype)).reshape(-1, nemb)
    from armnet_tpu.kernels.scatter_pallas import table_grad_flat

    # barrier: without it XLA re-materializes the padded 2-D view around
    # the v1 kernel's reshape and sinks optimizer work into it (measured
    # +4.9 ms/step in r1; ARMNET_NO_BARRIER=1 re-tests on newer XLA)
    import os as _os

    dflat = table_grad_flat(g.astype(jnp.float32), ids.reshape(-1),
                            flat_rows // nemb).astype(tdtype)
    if _os.environ.get("ARMNET_NO_BARRIER") != "1":
        dflat = jax.lax.optimization_barrier(dflat)
    return (dflat, np.zeros(ids.shape, jax.dtypes.float0), dvalues)


embedding_bag_flat.defvjp(_bag_flat_fwd, _bag_flat_bwd)


def scaled_embedding_lookup(table, ids, values, *, use_one_hot=None,
                            nemb=None):
    """Dispatching embedding-bag: the sharded collective path when a
    sharded_lookup_context is active and the table divides the model axis,
    else the MXU one-hot path for tiny tables, else gather (flat-table fast
    path when the table arrives as a [R*E] vector)."""
    flat = table.ndim == 1
    if flat:
        assert nemb, "flat tables need nemb"
        nrows = table.shape[0] // nemb
    else:
        nrows = table.shape[0]
    cfg = getattr(_ctx, "cfg", None)
    if cfg is not None:
        from armnet_tpu.parallel.embedding_parallel import (
            sharded_embedding_bag, sharded_embedding_bag_a2a)
        from armnet_tpu.parallel.mesh import MODEL_AXIS

        mesh = cfg["mesh"]
        nshards = mesh.shape.get(MODEL_AXIS, 1)
        if nshards > 1:
            if nrows % nshards == 0:
                t2 = table.reshape(nrows, -1) if flat else table
                if cfg["impl"] == "a2a":
                    return sharded_embedding_bag_a2a(
                        t2, ids, values, mesh,
                        capacity_factor=cfg["capacity_factor"])
                return sharded_embedding_bag(t2, ids, values, mesh)
            # visible, not silent: this table stays replicated (trace-time
            # warning — fires once per compilation, not per step)
            import warnings
            warnings.warn(
                f"sharded lookup requested but table rows ({nrows}) do not "
                f"divide the model axis ({nshards}); this table falls back "
                f"to the replicated (unsharded) lookup", stacklevel=3)
    if use_one_hot is None:
        use_one_hot = nrows <= ONE_HOT_MAX_ROWS
    if use_one_hot:
        t2 = table.reshape(nrows, -1) if flat else table
        return one_hot_embedding_bag(t2, ids, values)
    if flat:
        return embedding_bag_flat(table, ids, values, nemb)
    return embedding_bag(table, ids, values)
