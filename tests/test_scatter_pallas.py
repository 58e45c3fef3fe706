"""Bucketed table-gradient kernel (v4, the production variant — see
kernels/TABLE_GRAD_ATTIC.md for the pruned alternatives) vs plain
scatter-add: duplicates, skewed ids (all-equal worst case), ragged tails,
nrows not a multiple of the bucket. Interpret mode off-TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from armnet_tpu.kernels.scatter_pallas import (_table_grad_tpu_v4,
                                               table_grad,
                                               table_grad_reference)


def _check(g, ids, nrows):
    got = _table_grad_tpu_v4(g, ids, nrows, interpret=True)
    want = table_grad_reference(g, ids, nrows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=2e-5)


def test_random_duplicates():
    k = jax.random.split(jax.random.key(0), 2)
    n, e, nrows = 5000, 10, 6000
    ids = jax.random.randint(k[0], (n,), 0, nrows, dtype=jnp.int32)
    g = jax.random.normal(k[1], (n, e), jnp.float32)
    _check(g, ids, nrows)


def test_all_same_id():
    # worst-case skew: every update lands in one bucket's chunk loop
    n, e, nrows = 3000, 6, 4096
    ids = jnp.full((n,), 1234, jnp.int32)
    g = jnp.ones((n, e), jnp.float32)
    _check(g, ids, nrows)


def test_small_n_and_ragged_rows():
    # n < CHUNK exercises the padding path; nrows not a multiple of BUCKET
    k = jax.random.split(jax.random.key(1), 2)
    n, e, nrows = 37, 4, 3001
    ids = jax.random.randint(k[0], (n,), 0, nrows, dtype=jnp.int32)
    g = jax.random.normal(k[1], (n, e), jnp.float32)
    _check(g, ids, nrows)


def test_boundary_ids():
    # first and last rows of the table, plus bucket-boundary ids
    from armnet_tpu.kernels.scatter_pallas import BUCKET
    nrows = 3 * BUCKET
    ids = jnp.asarray([0, BUCKET - 1, BUCKET, 2 * BUCKET - 1, nrows - 1, 0],
                      jnp.int32)
    g = jnp.arange(6 * 5, dtype=jnp.float32).reshape(6, 5)
    _check(g, ids, nrows)


@pytest.mark.parametrize("n,e,nrows", [
    (900, 10, 5003),       # duplicates + ragged rows
    (500, 1, 16999),       # e=1 (Linear first-order weight tables)
    (800, 16, 9000),       # e divides 128 exactly
])
def test_v4_shape_coverage(n, e, nrows):
    k = jax.random.split(jax.random.key(7), 2)
    ids = jax.random.randint(k[0], (n,), 0, nrows, dtype=jnp.int32)
    g = jax.random.normal(k[1], (n, e), jnp.float32)
    _check(g, ids, nrows)


def test_multichunk_bucket():
    """A bucket with far more than CHUNK updates exercises the serial
    chunk loop (nchunks > 1 in one grid step)."""
    from armnet_tpu.kernels.scatter_pallas import CHUNK

    n, e, nrows = 4 * CHUNK + 57, 6, 8192
    k = jax.random.split(jax.random.key(7), 2)
    # all ids land in bucket 0 -> nchunks = ceil(n/CHUNK) > 1
    ids = jax.random.randint(k[0], (n,), 0, 100, dtype=jnp.int32)
    g = jax.random.normal(k[1], (n, e), jnp.float32)
    _check(g, ids, nrows)


def test_flat_output_variant():
    """table_grad_flat returns the row-major [nrows*E] gradient."""
    from armnet_tpu.kernels.scatter_pallas import table_grad_flat

    k = jax.random.split(jax.random.key(4), 2)
    n, e, nrows = 5000, 10, 6001          # nrows % BUCKET != 0
    ids = jax.random.randint(k[0], (n,), 0, nrows, dtype=jnp.int32)
    g = jax.random.normal(k[1], (n, e), jnp.float32)
    got = table_grad_flat(g, ids, nrows)
    assert got.shape == (nrows * e,)
    want = table_grad_reference(g, ids, nrows).reshape(-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_embedding_bag_grad_uses_it():
    """End-to-end: embedding_bag custom VJP table grad matches autodiff of
    the plain formulation."""
    from armnet_tpu.ops.embedding import embedding_bag

    k = jax.random.split(jax.random.key(2), 3)
    table = jax.random.normal(k[0], (200, 8))
    ids = jax.random.randint(k[1], (16, 5), 0, 200)
    values = jax.random.uniform(k[2], (16, 5))
    dout = jax.random.normal(jax.random.key(3), (16, 5, 8))

    def twin(t, v):
        return jnp.take(t, ids, axis=0) * v[..., None]

    gt, gv = jax.grad(
        lambda t, v: jnp.sum(embedding_bag(t, ids, v) * dout),
        argnums=(0, 1))(table, values)
    wt, wv = jax.grad(
        lambda t, v: jnp.sum(twin(t, v) * dout), argnums=(0, 1))(table,
                                                                 values)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(wt), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv), rtol=1e-5,
                               atol=1e-6)


def test_negative_id_wrap_matches_at_add():
    """_wrap_negative_ids (applied in the TPU dispatch before the kernel)
    must reproduce .at[].add's python-style index wrap, so TPU and CPU
    backwards agree on ids in [-nrows, 0) — the kernel's searchsorted
    bucket ranges start at 0 and would otherwise silently DROP those
    gradient rows."""
    from armnet_tpu.kernels.scatter_pallas import _wrap_negative_ids

    n, e, nrows = 300, 6, 2048
    k = jax.random.split(jax.random.key(11), 2)
    ids = jax.random.randint(k[0], (n,), -nrows, nrows, dtype=jnp.int32)
    g = jax.random.normal(k[1], (n, e), jnp.float32)

    wrapped = _wrap_negative_ids(ids, nrows)
    # the wrap IS .at[].add's normalization: same scatter either way
    np.testing.assert_allclose(
        np.asarray(table_grad_reference(g, wrapped, nrows)),
        np.asarray(table_grad_reference(g, ids, nrows)), atol=1e-6)
    # and the kernel on wrapped ids matches the reference on raw ids
    got = _table_grad_tpu_v4(g, wrapped, nrows, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(table_grad_reference(g, ids, nrows)),
                               rtol=1e-5, atol=2e-5)
