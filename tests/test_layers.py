"""Unit tests for the shared layer primitives that models exercise only
indirectly: pair-index helpers, normalize_adj, self-attention blocks, the
ANOVA kernel, FM pooling, and the learnable-alpha entmax gradient
(reference behaviors: models/layers.py, models/hofm.py:10-22,
utils/entmax.py:82-98)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from armnet_tpu.ops.interaction import anova_kernel
from armnet_tpu.ops.layers import (MLP, MultiHeadAttention, SelfAttnLayer,
                                   all_pair_indices, fm_pool, normalize_adj,
                                   triu_indices)


def test_pair_index_helpers():
    vi, vj = triu_indices(4)
    got = sorted(zip(np.asarray(vi).tolist(), np.asarray(vj).tolist()))
    assert got == [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    ai, aj = all_pair_indices(3)
    assert len(ai) == 9 and len(aj) == 9


def test_normalize_adj():
    adj = jnp.asarray([[0.0, 1.0], [1.0, 1.0]])
    got = np.asarray(normalize_adj(adj))
    # D^-1/2 (A) D^-1/2 with row-sum degrees
    d = np.asarray([1.0, 2.0]) ** -0.5
    want = np.diag(d) @ np.asarray(adj) @ np.diag(d)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_self_attn_layer():
    x = jax.random.normal(jax.random.key(0), (3, 5, 8))
    layer = SelfAttnLayer(8)
    var = layer.init(jax.random.key(1), x)
    out, weights = layer.apply(var, x)
    assert out.shape == (3, 5, 8)
    assert weights.shape == (3, 5, 5)
    np.testing.assert_allclose(np.asarray(weights.sum(-1)), 1.0, atol=1e-5)


def test_multihead_attention():
    x = jax.random.normal(jax.random.key(0), (2, 6, 8))
    layer = MultiHeadAttention(nhead=2, n_k=4, n_v=4)
    var = layer.init({"params": jax.random.key(1),
                      "dropout": jax.random.key(2)}, x, train=False)
    out, attn = layer.apply(var, x, train=False)
    assert out.shape == (2, 6, 8)           # residual + LayerNorm keeps shape
    assert attn.shape[-2:] == (6, 6)


def test_anova_kernel_vs_bruteforce():
    bsz, nfield, nemb, order = 2, 5, 3, 3
    x = jax.random.normal(jax.random.key(3), (bsz, nfield, nemb))
    got = np.asarray(anova_kernel(x, order))
    xn = np.asarray(x)
    want = np.zeros(bsz)
    for combo in itertools.combinations(range(nfield), order):
        prod = np.ones((bsz, nemb))
        for f in combo:
            prod = prod * xn[:, f, :]
        want += prod.sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_fm_pool_formula():
    x = jax.random.normal(jax.random.key(4), (3, 4, 6))
    xn = np.asarray(x)
    want_vec = 0.5 * ((xn.sum(1)) ** 2 - (xn ** 2).sum(1))
    np.testing.assert_allclose(np.asarray(fm_pool(x, reduce_dim=False)),
                               want_vec, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fm_pool(x)), want_vec.sum(-1),
                               rtol=1e-5)


def test_entmax_learnable_alpha_grad():
    """d/d_alpha via the custom VJP matches central finite differences
    (reference utils/entmax.py:82-98 Tsallis term)."""
    from armnet_tpu.ops.entmax import entmax_bisect

    x = jax.random.normal(jax.random.key(5), (4, 7)) * 1.5
    w = jax.random.normal(jax.random.key(6), (4, 7))

    def loss(alpha):
        return jnp.sum(entmax_bisect(x, alpha=alpha) * w)

    a0 = jnp.asarray(1.6)
    g = float(jax.grad(loss)(a0))
    eps = 1e-3
    fd = float((loss(a0 + eps) - loss(a0 - eps)) / (2 * eps))
    assert g == pytest.approx(fd, rel=2e-2, abs=1e-4)


def test_mlp_zero_layers_degenerates_to_linear():
    """nlayers==0 -> a single Linear (reference models/layers.py:79)."""
    x = jax.random.normal(jax.random.key(7), (5, 12))
    mlp = MLP(0, 16, 0.0, 3)
    var = mlp.init({"params": jax.random.key(8),
                    "dropout": jax.random.key(9)}, x, train=False)
    out = mlp.apply(var, x, train=False)
    assert out.shape == (5, 3)
    # exactly one kernel param
    leaves = jax.tree.leaves(var["params"])
    assert len(leaves) == 2  # kernel + bias


def test_multihead_fields_major_layout_matches_reference_math():
    """The [B,F,K*O] fields-major multi-head pipeline (TPU layout, r3) must
    be numerically identical to the reference-layout [B,K,O,F] math
    (/root/reference/models/armnet.py:26-36): same bilinear gate scores,
    entmax over fields, values scaling, and exp-cross."""
    from armnet_tpu.ops.entmax import entmax_bisect
    from armnet_tpu.ops.interaction import (arm_attention_multihead,
                                            arm_exp_cross,
                                            arm_exp_cross_fmajor)

    rng = np.random.RandomState(7)
    B, K, O, F, E, dk = 4, 3, 5, 7, 6, 6
    emb = jnp.asarray(rng.randn(B, F, E), jnp.float32)
    bw = jnp.asarray(rng.randn(K, E, dk) * 0.5, jnp.float32)
    q = jnp.asarray(rng.randn(K, O, dk) * 0.5, jnp.float32)
    v = jnp.asarray(rng.randn(K, O, F) * 0.5, jnp.float32)
    alpha = 1.5

    # reference-layout pipeline
    gates_ref = jnp.einsum("bfx,kxy,koy->bkof", emb, bw, q) * (dk ** -0.5)
    w_ref = entmax_bisect(gates_ref, alpha, axis=-1) * v[None]   # [B,K,O,F]
    out_ref = arm_exp_cross(emb, w_ref).reshape(B, K * O, E)

    # fields-major pipeline (production path)
    w_fm = arm_attention_multihead(
        emb, bw, q, v, lambda g: entmax_bisect(g, alpha, axis=1))  # [B,F,KO]
    np.testing.assert_allclose(
        np.asarray(w_fm), np.asarray(w_ref).transpose(0, 3, 1, 2).reshape(B, F, K * O),
        rtol=0, atol=2e-6)
    out_fm = arm_exp_cross_fmajor(emb, w_fm)                       # [B,KO,E]
    np.testing.assert_allclose(np.asarray(out_fm), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_arm1h_fields_major_layout_matches_bof_math(monkeypatch):
    """The 1h fields-major layout (production default since r5 — stage 02/04
    campaign A/B: +6.5-6.8% step throughput vs [B,O,F]) must be numerically
    identical to the [B,O,F] pipeline (reference armnet_1h.py:25-34 math)."""
    from armnet_tpu.ops.interaction import arm1h_interaction

    rng = np.random.RandomState(11)
    B, F, E, d, O = 4, 7, 6, 5, 9
    emb = jnp.asarray(rng.randn(B, F, E), jnp.float32)
    wk = jnp.asarray(rng.randn(E, d) * 0.5, jnp.float32)
    q = jnp.asarray(rng.randn(O, d) * 0.5, jnp.float32)
    v = jnp.asarray(rng.randn(O, F) * 0.5, jnp.float32)

    monkeypatch.setenv("ARMNET_ARM1H_LAYOUT", "bof")
    out_bof = arm1h_interaction(emb, wk, q, v, 1.5)
    monkeypatch.setenv("ARMNET_ARM1H_LAYOUT", "fmajor")
    out_fm = arm1h_interaction(emb, wk, q, v, 1.5)
    np.testing.assert_allclose(np.asarray(out_fm), np.asarray(out_bof),
                               rtol=2e-5, atol=2e-5)


def test_batchnorm_masked_stats_match_torch_small_batch():
    """BN running stats over a PADDED batch inside batch_mask_scope must
    equal torch BN over the equivalent genuinely-small batch. This is the
    r5 pad-pollution fix: the loader pads the last partial batch to B with
    mask-0 rows (frappe: 378 real + 3718 pad) and unmasked statistics let
    those rows poison the running mean/var every epoch — valid AUC decayed
    while batch-stats eval climbed (probe in BENCH_NOTES r5)."""
    import torch

    from armnet_tpu.ops.layers import BatchNorm, batch_mask_scope

    rng = np.random.RandomState(5)
    B, C, L, real = 16, 6, 4, 11
    x = rng.randn(B, C, L).astype(np.float32) * 2.0 + 1.0
    x[real:] = -7.5  # poison rows: obviously wrong if they leak into stats
    mask = np.zeros((B,), np.float32)
    mask[:real] = 1.0

    mod = BatchNorm(channel_axis=1)
    v = mod.init(jax.random.key(0), jnp.asarray(x), True)
    with batch_mask_scope(jnp.asarray(mask)):
        y, upd = mod.apply(v, jnp.asarray(x), True, mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm1d(C)
    tbn.train()
    ty = tbn(torch.tensor(x[:real]))

    stats = upd["batch_stats"]["BatchNorm_0"]
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               tbn.running_mean.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               tbn.running_var.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    # real rows' train-mode outputs match torch's small-batch normalize
    np.testing.assert_allclose(np.asarray(y)[:real], ty.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
