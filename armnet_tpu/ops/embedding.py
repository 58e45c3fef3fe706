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
import threading

import jax
import jax.numpy as jnp

__all__ = ["embedding_bag", "scaled_embedding_lookup", "one_hot_embedding_bag",
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
    """Embedding-bag as one-hot x table matmul (MXU path for tiny tables)."""
    nfeat = table.shape[0]
    oh = jax.nn.one_hot(ids, nfeat, dtype=table.dtype)        # [B, F, nfeat]
    # HIGHEST precision: a one-hot select must be exact — the default bf16 MXU
    # pass would silently round the f32 table.
    emb = jnp.einsum(
        "bfn,ne->bfe", oh, table,
        preferred_element_type=table.dtype, precision=jax.lax.Precision.HIGHEST,
    )
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


def scaled_embedding_lookup(table, ids, values, *, use_one_hot=None):
    """Dispatching embedding-bag: the sharded collective path when a
    sharded_lookup_context is active and the table divides the model axis,
    else the MXU one-hot path for tiny tables, else plain gather."""
    cfg = getattr(_ctx, "cfg", None)
    if cfg is not None:
        from armnet_tpu.parallel.embedding_parallel import (
            sharded_embedding_bag, sharded_embedding_bag_a2a)
        from armnet_tpu.parallel.mesh import MODEL_AXIS

        mesh = cfg["mesh"]
        nshards = mesh.shape.get(MODEL_AXIS, 1)
        if nshards > 1 and table.shape[0] % nshards == 0:
            if cfg["impl"] == "a2a":
                return sharded_embedding_bag_a2a(
                    table, ids, values, mesh,
                    capacity_factor=cfg["capacity_factor"])
            return sharded_embedding_bag(table, ids, values, mesh)
    if use_one_hot is None:
        use_one_hot = table.shape[0] <= ONE_HOT_MAX_ROWS
    if use_one_hot:
        return one_hot_embedding_bag(table, ids, values)
    return embedding_bag(table, ids, values)
