"""entmax bisection: math properties, closed-form grad vs finite differences,
and (when the reference checkout is present) bit-level parity with it."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from armnet_tpu.ops.entmax import entmax_bisect, sparsemax_bisect, sparse_normalizer

REF = "/root/reference"


def rand(shape, seed=0, scale=3.0):
    rng = np.random.RandomState(seed)
    return (rng.randn(*shape) * scale).astype(np.float32)


@pytest.mark.parametrize("alpha", [1.1, 1.5, 1.7, 2.0, 2.5])
def test_sums_to_one_and_nonneg(alpha):
    x = rand((64, 16), seed=1)
    y = np.asarray(entmax_bisect(x, alpha=alpha))
    assert np.all(y >= 0)
    np.testing.assert_allclose(y.sum(-1), 1.0, atol=1e-5)


def test_sparsity_grows_with_alpha():
    x = rand((256, 16), seed=2)
    nnz = []
    for alpha in [1.1, 1.5, 2.0]:
        y = np.asarray(entmax_bisect(x, alpha=alpha))
        nnz.append((y > 1e-7).sum())
    assert nnz[0] > nnz[1] > nnz[2]


def test_alpha_near_one_approaches_softmax():
    x = rand((32, 8), seed=3, scale=1.0)
    y = np.asarray(entmax_bisect(x, alpha=1.001))
    s = np.asarray(jax.nn.softmax(jnp.asarray(x), axis=-1))
    np.testing.assert_allclose(y, s, atol=2e-3)


def test_sparsemax_closed_form():
    # sparsemax has an exact sort-based solution; check bisection against it.
    x = rand((128, 10), seed=4)
    y = np.asarray(sparsemax_bisect(x))

    def sparsemax_exact(v):
        z = np.sort(v)[::-1]
        css = np.cumsum(z) - 1
        k = np.arange(1, len(v) + 1)
        support = z - css / k > 0
        k_z = k[support][-1]
        tau = css[support][-1] / k_z
        return np.maximum(v - tau, 0)

    expect = np.stack([sparsemax_exact(row) for row in x])
    np.testing.assert_allclose(y, expect, atol=1e-5)


@pytest.mark.parametrize("alpha", [1.3, 1.5, 2.0])
def test_grad_matches_finite_difference(alpha):
    x = jnp.asarray(rand((4, 6), seed=5, scale=1.0))

    def loss(x):
        y = entmax_bisect(x, alpha=alpha)
        return jnp.sum(jnp.sin(y) * jnp.arange(6.0))

    g = jax.grad(loss)(x)
    eps = 1e-3
    g_fd = np.zeros_like(np.asarray(x))
    for i in range(x.shape[0]):
        for j in range(x.shape[1]):
            d = np.zeros(x.shape, np.float32)
            d[i, j] = eps
            g_fd[i, j] = (loss(x + d) - loss(x - d)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), g_fd, atol=5e-3)


def test_alpha_gradient_finite_difference():
    x = jnp.asarray(rand((8, 6), seed=6, scale=1.0))

    def loss(a):
        y = entmax_bisect(x, alpha=a)
        return jnp.sum(jnp.square(y) * jnp.arange(6.0))

    a0 = 1.6
    g = jax.grad(loss)(jnp.float32(a0))
    eps = 1e-3
    g_fd = (loss(jnp.float32(a0 + eps)) - loss(jnp.float32(a0 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), float(g_fd), atol=5e-3)


def test_axis_argument():
    x = rand((5, 7, 9), seed=7)
    y0 = np.asarray(entmax_bisect(x, alpha=1.5, axis=1))
    y1 = np.moveaxis(
        np.asarray(entmax_bisect(np.moveaxis(x, 1, -1), alpha=1.5)), -1, 1
    )
    np.testing.assert_allclose(y0, y1, atol=1e-6)


def test_sparse_normalizer_softmax_fallback():
    x = jnp.asarray(rand((4, 5), seed=8))
    f = sparse_normalizer(1.0)
    np.testing.assert_allclose(
        np.asarray(f(x)), np.asarray(jax.nn.softmax(x, -1)), atol=1e-6
    )


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
@pytest.mark.parametrize("alpha", [1.5, 1.7, 2.0])
def test_parity_with_reference_entmax(alpha):
    import sys

    import torch

    sys.path.insert(0, REF)
    from utils.entmax import entmax_bisect as ref_entmax

    x = rand((64, 12), seed=9)
    xt = torch.tensor(x, requires_grad=True)
    yt = ref_entmax(xt, alpha=alpha, dim=-1)
    y = np.asarray(entmax_bisect(x, alpha=alpha))
    np.testing.assert_allclose(y, yt.detach().numpy(), atol=5e-6)

    # backward parity with the same upstream cotangent
    g_up = rand((64, 12), seed=10, scale=1.0)
    yt.backward(torch.tensor(g_up))

    def pullback(x_):
        y_, vjp = jax.vjp(lambda v: entmax_bisect(v, alpha=alpha), x_)
        return vjp(jnp.asarray(g_up))[0]

    gj = np.asarray(pullback(jnp.asarray(x)))
    np.testing.assert_allclose(gj, xt.grad.numpy(), atol=1e-5)


@pytest.mark.parametrize("alpha", [1.3, 1.7, 1.95, 2.5])
def test_fastpow_solver_matches_reference_bisection(alpha, monkeypatch):
    """The experimental bit-trick-warmup solver (ARMNET_ENTMAX_SOLVER=
    fastpow) must match the 50-iteration reference bisection to f32
    tolerance on adversarial inputs (ties, spikes, sorted kinks); at
    alpha > 2 it must fall back to the standard warmup."""
    from armnet_tpu.kernels import entmax_common
    from armnet_tpu.ops.entmax import _entmax_forward

    monkeypatch.setattr(entmax_common, "SOLVER", "fastpow")
    rng = np.random.RandomState(3)
    cases = [
        rng.randn(13, 257).astype(np.float32) * 2,
        np.repeat(rng.randn(1, 257).astype(np.float32), 13, 0)
        + 1e-6 * rng.randn(13, 257).astype(np.float32),
        np.where(rng.rand(13, 257) < 0.05, 10.0, -10.0).astype(np.float32),
        np.sort(rng.randn(13, 257).astype(np.float32), 0),
    ]
    for x in cases:
        x = jnp.asarray(x)
        got = entmax_common.solve_entmax_axis0(x, alpha)
        if alpha > 2.0:
            # fastpow falls back to the standard warmup there; match IT
            # bitwise (the (8,6) budget itself carries ~5e-4 on adversarial
            # inputs at alpha>2 — outside the ARM domain, pre-existing)
            monkeypatch.setattr(entmax_common, "SOLVER", "newton")
            want = entmax_common.solve_entmax_axis0(x, alpha)
            monkeypatch.setattr(entmax_common, "SOLVER", "fastpow")
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        else:
            want = _entmax_forward(x.T, alpha, 50).T
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=3e-6, rtol=0)
