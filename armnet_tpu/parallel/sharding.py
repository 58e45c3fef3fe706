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


def leaf_spec(leaf, nfeat, mesh, shard_embedding, name=None):
    """PartitionSpec for one state leaf.

    Gather-path tables are identified by parameter NAME + shape, not shape
    alone — size heuristics capture unrelated params when nfeat is small
    (UCI sets nfeat ~ nfield ~ 10: MLP biases match size % nfeat == 0,
    and gcn's [nemb, h] 'weight' can match a leading-dim test). The real
    tables are exactly: Embedding's 'embedding' ([nfeat, nemb] 2-D or
    flat [nfeat*nemb] 1-D) and FeaturesLinear's 'weight' ([nfeat, 1]).
    When no path name is available (name=None) shape heuristics are kept
    as a fallback."""
    if shard_embedding and hasattr(leaf, "ndim"):
        if leaf.ndim == 2 and leaf.shape[0] == nfeat:
            if name == "embedding" or name is None \
                    or (name == "weight" and leaf.shape[1] == 1):
                return table_spec(mesh, 2)
        if leaf.ndim == 1 and leaf.shape[0] >= nfeat \
                and leaf.shape[0] % nfeat == 0:
            # 'weight': FeaturesLinear's flat [nfeat] first-order weight
            # (stored flat for the same lane-padding reason as the tables)
            if name in ("embedding", "weight") or name is None:
                return table_spec(mesh, 1)   # flat-stored table
    return P()


def _leaf_name(path):
    """Last string-ish key of a tree path (param name for flax trees)."""
    for entry in reversed(path):
        key = getattr(entry, "key", getattr(entry, "name", None))
        if isinstance(key, str):
            return key
    return None


def state_shardings(state, mesh, nfeat, shard_embedding=False):
    """NamedSharding tree matching the TrainState pytree. Table leaves are
    matched by parameter path name + shape (Adam's mu/nu mirror the param
    tree, so the same rule covers the optimizer state)."""

    def to_sharding(path, leaf):
        return NamedSharding(
            mesh, leaf_spec(leaf, nfeat, mesh, shard_embedding,
                            name=_leaf_name(path)))

    return jax.tree_util.tree_map_with_path(to_sharding, state)


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
