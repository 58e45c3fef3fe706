"""Sharding rules for params / optimizer state / batches.

Rule: any parameter whose leading dimension equals `nfeat` is an
embedding-like table (the embedding tables, the deep-ensemble tables, the
first-order weight of FeaturesLinear) and is row-sharded over the 'model'
axis when embedding sharding is on. Everything else — interaction weights and
MLP heads, all small — is replicated; data parallelism shards the batch over
'data' and XLA inserts the gradient psum.

The optimizer state mirrors the parameter tree (Adam's mu/nu), so the same
leaf rule applied over the whole state pytree gives consistent shardings.
"""

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from armnet_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

__all__ = ["table_spec", "state_shardings", "batch_sharding", "leaf_spec"]


def table_spec(mesh, ndim=2):
    """Row-sharded table spec when the mesh has a model axis, else replicated.
    Flat [nfeat*nemb] tables shard their single axis (contiguous row blocks —
    identical data ownership to row-sharding the 2-D view)."""
    if MODEL_AXIS in mesh.shape and mesh.shape[MODEL_AXIS] > 1:
        return P(MODEL_AXIS, *([None] * (ndim - 1)))
    return P()


def leaf_spec(leaf, nfeat, mesh, shard_embedding):
    """PartitionSpec for one state leaf."""
    if shard_embedding and hasattr(leaf, "ndim"):
        if leaf.ndim == 2 and leaf.shape[0] == nfeat:
            return table_spec(mesh, 2)
        if (leaf.ndim == 1 and leaf.shape[0] >= nfeat
                and leaf.shape[0] % nfeat == 0):
            return table_spec(mesh, 1)       # flat-stored table
    return P()


def state_shardings(state, mesh, nfeat, shard_embedding=False):
    """NamedSharding tree matching the TrainState pytree."""

    def to_sharding(leaf):
        return NamedSharding(
            mesh, leaf_spec(leaf, nfeat, mesh, shard_embedding))

    return jax.tree.map(to_sharding, state)


def batch_sharding(mesh):
    """Batches shard their leading (example) axis over 'data'."""
    def spec(leaf_ndim):
        return P(DATA_AXIS, *([None] * (leaf_ndim - 1)))

    return {
        "id": NamedSharding(mesh, spec(2)),
        "value": NamedSharding(mesh, spec(2)),
        "y": NamedSharding(mesh, spec(1)),
        "mask": NamedSharding(mesh, spec(1)),
    }
