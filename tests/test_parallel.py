"""Sharded-embedding + mesh machinery on the 8-device virtual CPU mesh:
psum and a2a lookups match the dense reference, gradients scatter-add back to
the sharded table, and the sharding rules pick the right specs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from armnet_tpu.ops.embedding import embedding_bag
from armnet_tpu.parallel.embedding_parallel import (
    sharded_embedding_bag, sharded_embedding_bag_a2a)
from armnet_tpu.parallel.mesh import make_mesh, parse_mesh_spec
from armnet_tpu.parallel.sharding import leaf_spec, state_shardings


def setup_module(module):
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"


def make_inputs(nfeat=64, nemb=16, b=32, f=5, seed=0):
    rng = np.random.RandomState(seed)
    table = jnp.asarray(rng.randn(nfeat, nemb).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, nfeat, (b, f)), jnp.int32)
    values = jnp.asarray(rng.rand(b, f).astype(np.float32))
    return table, ids, values


def test_parse_mesh_spec():
    assert parse_mesh_spec("") == {"data": -1}
    assert parse_mesh_spec("data:4,model:2") == {"data": 4, "model": 2}
    m = make_mesh("data:4,model:2")
    assert m.shape == {"data": 4, "model": 2}
    m2 = make_mesh("data:-1,model:2")
    assert m2.shape["data"] == 4
    with pytest.raises(ValueError):
        make_mesh("data:3,model:2")


@pytest.mark.parametrize("mesh_spec", ["data:4,model:2", "data:2,model:4",
                                       "data:1,model:8"])
def test_psum_lookup_matches_dense(mesh_spec):
    mesh = make_mesh(mesh_spec)
    table, ids, values = make_inputs()
    want = embedding_bag(table, ids, values)
    got = sharded_embedding_bag(table, ids, values, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("mesh_spec", ["data:4,model:2", "data:2,model:4",
                                       "data:1,model:8"])
def test_a2a_lookup_matches_dense(mesh_spec):
    mesh = make_mesh(mesh_spec)
    table, ids, values = make_inputs(seed=1)
    want = embedding_bag(table, ids, values)
    # generous capacity so no request drops in this exactness test
    got = sharded_embedding_bag_a2a(table, ids, values, mesh,
                                    capacity_factor=8.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_a2a_handles_duplicate_and_skewed_ids():
    mesh = make_mesh("data:2,model:4")
    table, _, _ = make_inputs(seed=2)
    # all requests hit shard 0 rows + duplicates: worst-case skew
    ids = jnp.asarray(np.full((16, 5), 3), jnp.int32)
    values = jnp.ones((16, 5), jnp.float32)
    want = embedding_bag(table, ids, values)
    got = sharded_embedding_bag_a2a(table, ids, values, mesh,
                                    capacity_factor=8.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("impl", [sharded_embedding_bag,
                                  sharded_embedding_bag_a2a])
def test_gradients_scatter_back_to_table(impl):
    mesh = make_mesh("data:2,model:4")
    table, ids, values = make_inputs(seed=3)
    kwargs = {"capacity_factor": 8.0} if impl is sharded_embedding_bag_a2a else {}

    def loss_sharded(t):
        return jnp.sum(jnp.sin(impl(t, ids, values, mesh, **kwargs)))

    def loss_dense(t):
        return jnp.sum(jnp.sin(embedding_bag(t, ids, values)))

    g_sharded = jax.grad(loss_sharded)(table)
    g_dense = jax.grad(loss_dense)(table)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_dense),
                               atol=1e-5)


def test_lookup_under_jit_with_sharded_inputs():
    mesh = make_mesh("data:4,model:2")
    table, ids, values = make_inputs(seed=4)
    table = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    ids = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    values = jax.device_put(values, NamedSharding(mesh, P("data", None)))

    f = jax.jit(lambda t, i, v: sharded_embedding_bag(t, i, v, mesh))
    got = f(table, ids, values)
    want = embedding_bag(jax.device_get(table), jax.device_get(ids),
                         jax.device_get(values))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_state_sharding_rules():
    mesh = make_mesh("data:4,model:2")
    nfeat = 128
    fake_state = {
        "params": {"embedding": jnp.zeros((nfeat, 16)),
                   "mlp": {"kernel": jnp.zeros((64, 32))}},
        "mu": {"embedding": jnp.zeros((nfeat, 16)),
               "mlp": {"kernel": jnp.zeros((64, 32))}},
    }
    sh = state_shardings(fake_state, mesh, nfeat, shard_embedding=True)
    assert sh["params"]["embedding"].spec == P("model", None)
    assert sh["mu"]["embedding"].spec == P("model", None)   # opt state mirrors
    assert sh["params"]["mlp"]["kernel"].spec == P()
    assert leaf_spec(jnp.zeros((nfeat, 16)), nfeat, mesh, False) == P()


def test_a2a_overflow_counter_matches_actual_drops():
    """Power-law ids at the default capacity_factor=2.0: the counter must
    equal the number of requests the a2a lookup zeroed (VERDICT r1: skewed
    real ids silently lose accuracy without this)."""
    from armnet_tpu.parallel.embedding_parallel import a2a_overflow_count

    mesh = make_mesh("data:2,model:4")
    nfeat, nemb, b, f = 64, 16, 32, 5
    rng = np.random.RandomState(5)
    table = jnp.asarray(rng.randn(nfeat, nemb).astype(np.float32))
    # zipf-ish skew concentrated on shard 0's rows
    raw = rng.zipf(1.5, size=(b, f))
    ids = jnp.asarray(np.minimum(raw - 1, nfeat - 1), jnp.int32)
    values = jnp.ones((b, f), jnp.float32)

    got = sharded_embedding_bag_a2a(table, ids, values, mesh,
                                    capacity_factor=2.0)
    want = embedding_bag(table, ids, values)
    # a dropped request returns a zero row where the dense path doesn't
    dense_nonzero = np.abs(np.asarray(want)).sum(-1) > 1e-12
    got_zero = np.abs(np.asarray(got)).sum(-1) < 1e-12
    actual_drops = int(np.sum(dense_nonzero & got_zero))

    counted = float(a2a_overflow_count(ids, nfeat, mesh,
                                       capacity_factor=2.0))
    assert counted == actual_drops
    assert counted > 0, "test should exercise real overflow at cap 2.0"

    # and generous capacity drops nothing
    assert float(a2a_overflow_count(ids, nfeat, mesh,
                                    capacity_factor=16.0)) == 0


def test_flat_table_sharding_matches_by_name_not_size():
    """1-D leaves shard only when the param path names an embedding —
    an MLP bias whose size happens to be a multiple of nfeat must stay
    replicated (ADVICE r1)."""
    mesh = make_mesh("data:4,model:2")
    nfeat, nemb = 10, 10
    fake_state = {
        "params": {"emb": {"embedding": jnp.zeros((nfeat * nemb,))},
                   "mlp": {"bias": jnp.zeros((nfeat * nemb,)),   # 100 units
                           "kernel": jnp.zeros((64, 100))}},
    }
    sh = state_shardings(fake_state, mesh, nfeat, shard_embedding=True)
    assert sh["params"]["emb"]["embedding"].spec == P("model")
    assert sh["params"]["mlp"]["bias"].spec == P()
    assert sh["params"]["mlp"]["kernel"].spec == P()


def test_indivisible_nfeat_falls_back_with_warning():
    """nfeat not divisible by the model axis: the lookup must fall back to
    the replicated path (correct results) and WARN, not silently unshard
    (VERDICT r1 weak #4)."""
    import warnings

    from armnet_tpu.ops.embedding import (scaled_embedding_lookup,
                                          sharded_lookup_context)

    mesh = make_mesh("data:4,model:2")
    nfeat = 63                               # 63 % 2 != 0
    rng = np.random.RandomState(7)
    table = jnp.asarray(rng.randn(nfeat, 8).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, nfeat, (16, 5)), jnp.int32)
    values = jnp.ones((16, 5), jnp.float32)
    want = embedding_bag(table, ids, values)
    with sharded_lookup_context(mesh, "psum"):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            got = scaled_embedding_lookup(table, ids, values,
                                          use_one_hot=False)
    assert any("replicated" in str(x.message) for x in w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_flat_table_shard_with_odd_nemb():
    """Flat [R*E] tables shard over 'model' as contiguous blocks even when
    nemb does not divide 128 (lane-tile-unfriendly E must not break the
    sharded lookup path)."""
    from armnet_tpu.ops.embedding import (scaled_embedding_lookup,
                                          sharded_lookup_context)

    mesh = make_mesh("data:2,model:4")
    nfeat, nemb = 64, 7                      # 7 ∤ 128
    rng = np.random.RandomState(8)
    flat = jnp.asarray(rng.randn(nfeat * nemb).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, nfeat, (8, 3)), jnp.int32)
    values = jnp.asarray(rng.rand(8, 3).astype(np.float32))
    want = embedding_bag(flat.reshape(nfeat, nemb), ids, values)
    with sharded_lookup_context(mesh, "psum"):
        got = scaled_embedding_lookup(flat, ids, values, use_one_hot=False,
                                      nemb=nemb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_eval_under_mesh_with_ragged_final_batch():
    """Eval on a mesh where the final batch is padded (mask 0 rows): the
    masked metrics must equal the unpadded single-device metrics."""
    from armnet_tpu.data.libsvm import BatchIterator
    from armnet_tpu.parallel.sharding import batch_sharding
    from armnet_tpu.train.metrics import masked_roc_auc

    class TinyDS:
        def __init__(self, n, f, nfeat, seed=3):
            r = np.random.RandomState(seed)
            self.ids = r.randint(0, nfeat, (n, f)).astype(np.int32)
            self.values = np.ones((n, f), np.float32)
            self.labels = r.randint(0, 2, (n,)).astype(np.float32)
            self.nfield = f

        def __len__(self):
            return self.labels.shape[0]

    mesh = make_mesh("data:8")
    ds = TinyDS(100, 4, 50)                    # 100 % 64 != 0 -> ragged
    sh = batch_sharding(mesh)
    it = BatchIterator(ds, batch_size=64, shuffle=False, sharding=sh)
    batches = list(it)
    assert batches[-1]["id"].shape[0] == 64    # padded to full batch
    # fake logits: a deterministic function of ids
    for b in batches:
        logits = jnp.sum(b["id"].astype(jnp.float32), axis=1) / 100.0
        auc_masked = float(masked_roc_auc(logits, b["y"], b["mask"]))
        keep = np.asarray(b["mask"]) > 0
        auc_ref = float(masked_roc_auc(
            jnp.asarray(np.asarray(logits)[keep]),
            jnp.asarray(np.asarray(b["y"])[keep]),
            jnp.ones(int(keep.sum()), jnp.float32)))
        assert abs(auc_masked - auc_ref) < 1e-6
