"""Bucketed table-gradient kernel vs plain scatter-add: duplicates, skewed
ids (all-equal worst case), ragged tails, nrows not a multiple of the
bucket. Interpret mode off-TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from armnet_tpu.kernels.scatter_pallas import (_table_grad_tpu, table_grad,
                                               table_grad_reference)


def _check(g, ids, nrows):
    got = _table_grad_tpu(g, ids, nrows, interpret=True)
    want = table_grad_reference(g, ids, nrows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_random_duplicates():
    k = jax.random.split(jax.random.key(0), 2)
    n, e, nrows = 5000, 10, 6000
    ids = jax.random.randint(k[0], (n,), 0, nrows, dtype=jnp.int32)
    g = jax.random.normal(k[1], (n, e), jnp.float32)
    _check(g, ids, nrows)


def test_all_same_id():
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


@pytest.mark.parametrize("n,e,nrows", [
    (5000, 10, 20001),     # duplicates, ragged last group (20001 % 64 != 0)
    (37, 4, 3001),         # n < CHUNK2 padding path
    (3000, 6, 4096),       # heavy duplicates via small id range below
    (500, 1, 16999),       # e=1 (Linear first-order weight tables), k=128
    (800, 16, 9000),       # e divides 128 exactly, k=8
])
def test_v2_grouped_kernel_parity(n, e, nrows):
    """v2 grouped densify (digit-factorized one-hot, exact-tiled output) vs
    plain scatter-add, interpret mode."""
    from armnet_tpu.kernels.scatter_pallas import _table_grad_tpu_v2

    k = jax.random.split(jax.random.key(7), 2)
    ids = jax.random.randint(k[0], (n,), 0, nrows, dtype=jnp.int32)
    g = jax.random.normal(k[1], (n, e), jnp.float32)
    got = _table_grad_tpu_v2(g, ids, nrows, interpret=True)
    want = table_grad_reference(g, ids, nrows).reshape(-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_v2_all_same_id():
    from armnet_tpu.kernels.scatter_pallas import _table_grad_tpu_v2

    n, e, nrows = 3000, 6, 40960
    ids = jnp.full((n,), 12345, jnp.int32)
    g = jnp.ones((n, e), jnp.float32)
    got = _table_grad_tpu_v2(g, ids, nrows, interpret=True)
    want = table_grad_reference(g, ids, nrows).reshape(-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_v2_boundary_ids():
    from armnet_tpu.kernels.scatter_pallas import _table_grad_tpu_v2

    e = 10
    bucket = 128 * (128 // np.gcd(e, 128))          # 8192
    nrows = 2 * bucket + 7
    ids = jnp.asarray([0, bucket - 1, bucket, 2 * bucket - 1, nrows - 1, 0,
                       63, 64, 127, 128], jnp.int32)
    g = jnp.arange(10 * e, dtype=jnp.float32).reshape(10, e)
    got = _table_grad_tpu_v2(g, ids, nrows, interpret=True)
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


@pytest.mark.parametrize("n,e,nrows", [
    (900, 10, 5003),       # duplicates + ragged rows
    (37, 4, 3001),         # n < CHUNK padding path
])
def test_v4_bf16_payload_kernel_parity(n, e, nrows):
    """v4 (bf16 hi|residual payload + separate id row) vs plain
    scatter-add, interpret mode — numerics must match v1's two-term bf16
    budget."""
    from armnet_tpu.kernels.scatter_pallas import _table_grad_tpu_v4

    k = jax.random.split(jax.random.key(7), 2)
    ids = jax.random.randint(k[0], (n,), 0, nrows, dtype=jnp.int32)
    g = jax.random.normal(k[1], (n, e), jnp.float32)
    got = _table_grad_tpu_v4(g, ids, nrows, interpret=True)
    want = table_grad_reference(g, ids, nrows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=2e-5)


@pytest.mark.parametrize("n,e,nrows", [
    (900, 10, 5003),       # duplicates + ragged rows (nrows % BUCKET != 0)
    (37, 4, 3001),         # n < CHUNK padding path
    (3000, 6, 4096),       # exact bucket multiple
])
def test_v5_transposed_output_kernel_parity(n, e, nrows):
    """v5 (transposed [e, nrows] output blocks) vs plain scatter-add,
    interpret mode — same bf16 hi|residual budget as v4, different output
    layout (lane axis = table rows)."""
    from armnet_tpu.kernels.scatter_pallas import _table_grad_tpu_v5

    k = jax.random.split(jax.random.key(11), 2)
    ids = jax.random.randint(k[0], (n,), 0, nrows, dtype=jnp.int32)
    g = jax.random.normal(k[1], (n, e), jnp.float32)
    got = _table_grad_tpu_v5(g, ids, nrows, interpret=True)
    assert got.shape == (e, nrows)
    want = table_grad_reference(g, ids, nrows)
    np.testing.assert_allclose(np.asarray(got).T, np.asarray(want),
                               rtol=1e-5, atol=2e-5)


def test_v5_all_same_id():
    from armnet_tpu.kernels.scatter_pallas import _table_grad_tpu_v5

    n, e, nrows = 3000, 6, 4096
    ids = jnp.full((n,), 1234, jnp.int32)
    g = jnp.ones((n, e), jnp.float32)
    got = _table_grad_tpu_v5(g, ids, nrows, interpret=True)
    want = table_grad_reference(g, ids, nrows)
    np.testing.assert_allclose(np.asarray(got).T, np.asarray(want),
                               rtol=1e-5, atol=2e-5)


@pytest.mark.parametrize("n,e,nrows", [
    (900, 10, 5003),       # duplicates + ragged rows, nb not a G multiple
    (37, 4, 3001),         # n < CHUNK padding path
    (3000, 6, 4096),       # exact bucket multiple, nb < G (single program)
    (5000, 10, 60000),     # several groups
])
def test_v6_grouped_dma_kernel_parity(n, e, nrows):
    """v6 (G buckets per program, overlapped chunk-0 DMAs) vs plain
    scatter-add, interpret mode — v5's output layout and numerics."""
    from armnet_tpu.kernels.scatter_pallas import _table_grad_tpu_v6

    k = jax.random.split(jax.random.key(13), 2)
    ids = jax.random.randint(k[0], (n,), 0, nrows, dtype=jnp.int32)
    g = jax.random.normal(k[1], (n, e), jnp.float32)
    got = _table_grad_tpu_v6(g, ids, nrows, interpret=True)
    assert got.shape == (e, nrows)
    want = table_grad_reference(g, ids, nrows)
    np.testing.assert_allclose(np.asarray(got).T, np.asarray(want),
                               rtol=1e-5, atol=2e-5)


def test_v6_multichunk_bucket():
    """A bucket with far more than CHUNK updates exercises v6's serial
    tail-chunk loop (chunks 1.. fall back to per-chunk DMAs)."""
    from armnet_tpu.kernels.scatter_pallas import _table_grad_tpu_v6, CHUNK

    n, e, nrows = 4 * CHUNK + 57, 6, 8192
    k = jax.random.split(jax.random.key(7), 2)
    # all ids land in bucket 0 -> nchunks = ceil(n/CHUNK) > 1
    ids = jax.random.randint(k[0], (n,), 0, 100, dtype=jnp.int32)
    g = jax.random.normal(k[1], (n, e), jnp.float32)
    got = _table_grad_tpu_v6(g, ids, nrows, interpret=True)
    want = table_grad_reference(g, ids, nrows)
    np.testing.assert_allclose(np.asarray(got).T, np.asarray(want),
                               rtol=1e-5, atol=2e-5)


def test_negative_id_wrap_matches_at_add():
    """_wrap_negative_ids (applied in the TPU dispatch before every kernel)
    must reproduce .at[].add's python-style index wrap, so TPU and CPU
    backwards agree on ids in [-nrows, 0) — the kernels' searchsorted
    bucket ranges start at 0 and would otherwise silently DROP those
    gradient rows."""
    from armnet_tpu.kernels.scatter_pallas import (_table_grad_tpu_v4,
                                                   _wrap_negative_ids)

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
