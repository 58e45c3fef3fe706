"""Pallas kernels vs their jnp twins (CPU interpret mode; the compiled TPU
path is exercised by bench.py and the verify drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from armnet_tpu.kernels.entmax_pallas import entmax_pallas
from armnet_tpu.ops.entmax import entmax_bisect


def rand(shape, seed=0, scale=3.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray((rng.randn(*shape) * scale).astype(np.float32))


@pytest.mark.parametrize("alpha", [1.5, 1.7, 2.0, 2.5])
def test_entmax_kernel_matches_jnp(alpha):
    x = rand((64, 8, 13), seed=1)
    with pltpu.force_tpu_interpret_mode():
        yk = entmax_pallas(x, alpha=alpha)
    yr = entmax_bisect(x, alpha=float(alpha))
    # alpha > 2: p = z^(1/(alpha-1)) has unbounded slope at the support
    # boundary, so two tau solves both converged to f32 precision can differ
    # by ~1e-5 in p exactly at entering/leaving coordinates
    atol = 1e-5 if alpha > 2 else 5e-6
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yr), atol=atol)


@pytest.mark.parametrize("alpha", [1.5, 1.7, 2.0])
def test_entmax_kernel_grad_matches_jnp(alpha):
    x = rand((32, 11), seed=2, scale=1.5)
    g_up = rand((32, 11), seed=3, scale=1.0)

    with pltpu.force_tpu_interpret_mode():
        _, vjp_k = jax.vjp(lambda v: entmax_pallas(v, alpha=alpha), x)
        gk = vjp_k(g_up)[0]
    _, vjp_r = jax.vjp(lambda v: entmax_bisect(v, alpha=float(alpha)), x)
    gr = vjp_r(g_up)[0]
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=2e-5)


def test_entmax_kernel_irregular_rows():
    # rows not a multiple of the 1024 lane block: masked edge tiles
    x = rand((7, 5, 13), seed=4)  # 35 rows
    with pltpu.force_tpu_interpret_mode():
        yk = entmax_pallas(x, alpha=1.7)
    yr = entmax_bisect(x, alpha=1.7)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yr), atol=2e-6)
    np.testing.assert_allclose(np.asarray(yk.sum(-1)), 1.0, atol=1e-5)


def test_static_alpha_jnp_path_matches_traced():
    x = rand((32, 9), seed=5)
    y_static = entmax_bisect(x, alpha=1.5)            # python float -> static
    y_traced = entmax_bisect(x, alpha=jnp.float32(1.5))  # traced path
    np.testing.assert_allclose(np.asarray(y_static), np.asarray(y_traced),
                               atol=1e-6)


def test_entmax_pallas_rejects_alpha_le_one():
    with pytest.raises(ValueError):
        entmax_pallas(rand((4, 4)), alpha=1.0)


@pytest.mark.parametrize("shape,alpha", [
    ((8, 13, 256), 1.5),      # BB=8, LB=256 (multi-head gate geometry)
    ((6, 39, 128), 2.0),      # BB=2, LB=128
    ((4, 7, 384), 1.7),       # C=384 -> LB=128, BB=4
])
def test_entmax_mid_axis_path_matches_jnp(shape, alpha):
    """The zero-relayout 3-D mid-axis entry ([BB, d, LB] blocks) must match
    the jnp twin on axis=1, forward and VJP."""
    from armnet_tpu.kernels.entmax_pallas import _mid_blocks

    assert _mid_blocks(shape[0], shape[2]) is not None
    x = rand(shape, seed=5)
    with pltpu.force_tpu_interpret_mode():
        yk = entmax_pallas(x, alpha=alpha, axis=1)
    yr = entmax_bisect(jnp.moveaxis(x, 1, -1), alpha=float(alpha))
    np.testing.assert_allclose(np.asarray(yk),
                               np.asarray(jnp.moveaxis(yr, -1, 1)),
                               atol=5e-6)

    g = rand(shape, seed=6, scale=1.0)
    with pltpu.force_tpu_interpret_mode():
        _, vjp_k = jax.vjp(lambda v: entmax_pallas(v, alpha=alpha, axis=1), x)
        dk = vjp_k(g)[0]
    _, vjp_r = jax.vjp(
        lambda v: jnp.moveaxis(
            entmax_bisect(jnp.moveaxis(v, 1, -1), alpha=float(alpha)), -1, 1),
        x)
    dr = vjp_r(g)[0]
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dr), atol=2e-5)


def test_entmax_mid_axis_fallback_on_unaligned_c():
    """C not lane-aligned -> falls back to the moveaxis path, same result."""
    x = rand((4, 9, 15), seed=7)
    with pltpu.force_tpu_interpret_mode():
        yk = entmax_pallas(x, alpha=1.5, axis=1)
    yr = entmax_bisect(jnp.moveaxis(x, 1, -1), alpha=1.5)
    np.testing.assert_allclose(np.asarray(yk),
                               np.asarray(jnp.moveaxis(yr, -1, 1)),
                               atol=5e-6)
