"""Fused ARM-1h Pallas kernel vs the jnp twin: forward parity, full VJP
parity (input + all three parameter grads), padding (B not a multiple of the
tile), and alpha specializations. Runs in interpret mode off-TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from armnet_tpu.kernels.arm_pallas import arm1h_fused, arm1h_reference


def _inputs(b=24, f=7, e=6, dk=6, o=9, seed=0):
    ks = jax.random.split(jax.random.key(seed), 4)
    emb = jax.random.normal(ks[0], (b, f, e), jnp.float32) * 0.5
    wk = jax.random.normal(ks[1], (e, dk), jnp.float32) * 0.3
    query = jax.random.normal(ks[2], (o, dk), jnp.float32) * 0.3
    values = jax.random.normal(ks[3], (o, f), jnp.float32) * 0.3
    return emb, wk, query, values


@pytest.mark.parametrize("alpha", [1.5, 1.7, 2.0, 2.5])
def test_forward_parity(alpha):
    emb, wk, query, values = _inputs()
    got = arm1h_fused(emb, wk, query, values, alpha)
    want = arm1h_reference(emb, wk, query, values, alpha)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("alpha", [1.5, 2.0])
def test_grad_parity(alpha):
    emb, wk, query, values = _inputs(b=16, f=5, e=4, dk=4, o=6, seed=3)

    def loss_fused(e_, w_, q_, v_):
        return jnp.sum(jnp.sin(arm1h_fused(e_, w_, q_, v_, alpha)))

    def loss_ref(e_, w_, q_, v_):
        return jnp.sum(jnp.sin(arm1h_reference(e_, w_, q_, v_, alpha)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(emb, wk, query,
                                                         values)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(emb, wk, query, values)
    for gf, gr, name in zip(g_fused, g_ref,
                            ("emb", "wk", "query", "values")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def test_batch_padding():
    # B=11 is not a multiple of any tile size: wrapper pads, slices back
    emb, wk, query, values = _inputs(b=11, seed=5)
    got = arm1h_fused(emb, wk, query, values, 1.7)
    want = arm1h_reference(emb, wk, query, values, 1.7)
    assert got.shape == want.shape == (11, 9, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # padded-row grads don't leak into parameter grads
    g = jax.grad(lambda v: jnp.sum(arm1h_fused(emb, wk, query, v, 1.7)))(
        values)
    gr = jax.grad(lambda v: jnp.sum(arm1h_reference(emb, wk, query, v,
                                                    1.7)))(values)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=5e-4, atol=5e-5)


def test_model_dispatch_parity():
    """armnet_1h through the model produces the same logits whether the
    interaction runs fused (interpret-mode Pallas) or via the jnp twin."""
    from armnet_tpu.kernels.config import set_kernel_backend
    from armnet_tpu.models import create_model
    from armnet_tpu.models.config import ModelConfig

    cfg = ModelConfig(model="armnet_1h", nfeat=40, nfield=6, nemb=8, h=10,
                      alpha=1.7, mlp_nlayer=1, mlp_nhid=16)
    model = create_model(cfg)
    batch = {"id": jnp.arange(24, dtype=jnp.int32).reshape(4, 6) % 40,
             "value": jnp.full((4, 6), 0.5, jnp.float32)}
    var = model.init({"params": jax.random.key(0),
                      "dropout": jax.random.key(1)}, batch, train=False)
    try:
        set_kernel_backend("xla")
        y_xla = model.apply(var, batch, train=False)
        set_kernel_backend("pallas-fused")
        y_pl = model.apply(var, batch, train=False)
    finally:
        set_kernel_backend("auto")
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla),
                               rtol=2e-4, atol=2e-4)
