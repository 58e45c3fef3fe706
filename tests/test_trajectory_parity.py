"""Optimizer TRAJECTORY parity vs the torch reference (VERDICT r4 weak #3).

The zoo convergence table (benchmarks/results/zoo_parity_cpu.json) showed
single-seed valid-AUC gaps for afm (-0.031) and lr (-0.022). Two hypotheses:
(a) init/data RNG luck (legitimate cross-framework difference), or (b) a real
semantics bug in our loss/clip/Adam chain. This test separates them: it
transplants IDENTICAL initial weights into the reference
(/root/reference/train.py:60-66 — BCEWithLogitsLoss, per-parameter
clamp(-1,1) hooks, torch.optim.Adam) and runs K identical full training
steps on the SAME batch sequence in both frameworks. If the trajectories
agree to float tolerance, every gap left in the convergence table is RNG,
not semantics.

dropout=0 so the steps are deterministic (afn has BatchNorm: batch-stats
semantics are part of what the test pins).
"""

import os
import sys

import jax
import numpy as np
import pytest

from armnet_tpu.models import ModelConfig, create_model
from armnet_tpu.train.step import create_train_state, init_meters, make_train_step

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout absent")

NSTEPS = 25
NFEAT, NFIELD, NEMB = 200, 10, 8
LR = 0.003


def _batches(nsteps, bsz=64, seed=7):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(nsteps):
        out.append({
            "id": rng.randint(0, NFEAT, (bsz, NFIELD)).astype(np.int64),
            "value": rng.rand(bsz, NFIELD).astype(np.float32),
            "y": rng.randint(0, 2, (bsz,)).astype(np.float32),
        })
    return out


def _run_ours(name, batches, cfg_kw=None):
    import jax.numpy as jnp

    from armnet_tpu.models import param_transform_for

    cfg = ModelConfig(model=name, nfeat=NFEAT, nfield=NFIELD, nemb=NEMB,
                      h=6, dropout=0.0, **(cfg_kw or {}))
    model = create_model(cfg)
    b0 = {"id": jnp.asarray(batches[0]["id"], jnp.int32),
          "value": jnp.asarray(batches[0]["value"]),
          "y": jnp.asarray(batches[0]["y"]),
          "mask": jnp.ones((batches[0]["y"].shape[0],), jnp.float32)}
    state = create_train_state(model, b0, lr=LR, seed=0)
    ptrans = param_transform_for(name)
    step = make_train_step(param_transform=ptrans)
    meters = init_meters()
    losses = []
    key = jax.random.key(0)
    for b in batches:
        jb = {"id": jnp.asarray(b["id"], jnp.int32),
              "value": jnp.asarray(b["value"]),
              "y": jnp.asarray(b["y"]),
              "mask": jnp.ones((b["y"].shape[0],), jnp.float32)}
        state, meters = step(state, meters, jb, key)
        losses.append(float(meters["loss_last"]))
    # eval-mode logits on the first batch after training (param mutation
    # applied like the product eval step does)
    eval_params = ptrans(state.params) if ptrans else state.params
    logits = model.apply({"params": eval_params,
                          "batch_stats": state.batch_stats},
                         {"id": b0["id"], "value": b0["value"]}, train=False)
    return state, np.asarray(losses), np.asarray(logits)


def _run_ref(name, init_sd, batches, ns_kw=None):
    import logging

    import torch

    sys.path.insert(0, REF)
    from models.model_utils import create_model as ref_create

    import argparse
    a = argparse.Namespace(model=name, nfeat=NFEAT, nfield=NFIELD, nemb=NEMB,
                           k=3, h=6, mlp_nlayer=2, mlp_nhid=16, dropout=0.0,
                           nattn_head=2, ensemble=False, dnn_nlayer=1,
                           dnn_nhid=12, alpha=1.7)
    for k, v in (ns_kw or {}).items():
        setattr(a, k, v)
    plogger = logging.getLogger(f"traj_{name}")
    plogger.addHandler(logging.NullHandler())
    ref = ref_create(a, plogger)
    ref.load_state_dict(init_sd, strict=False)
    ref.train()

    # exact reference optimizer chain (train.py:60-66)
    opt_metric = torch.nn.BCEWithLogitsLoss(reduction="mean")
    optimizer = torch.optim.Adam(ref.parameters(), lr=LR)
    for p in ref.parameters():
        p.register_hook(lambda grad: torch.clamp(grad, -1., 1.))

    losses = []
    for b in batches:
        tb = {"id": torch.tensor(b["id"]),
              "value": torch.tensor(b["value"])}
        y = ref(tb)
        loss = opt_metric(y, torch.tensor(b["y"]))
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        losses.append(float(loss.item()))

    ref.eval()
    with torch.no_grad():
        logits = ref({"id": torch.tensor(batches[0]["id"]),
                      "value": torch.tensor(batches[0]["value"])}).numpy()
    return np.asarray(losses), logits


def test_lr_trajectory_matches_reference():
    """25 identical Adam steps on LR: same loss curve, same final logits."""
    import torch

    batches = _batches(NSTEPS)
    state, ours_losses, ours_logits = _run_ours("lr", batches)

    def t(x):
        return torch.tensor(np.asarray(x))

    # transplant the INITIAL params: re-init to get the t=0 tree
    # (create_train_state used the same keys, so this reproduces them)
    import jax.numpy as jnp
    cfg = ModelConfig(model="lr", nfeat=NFEAT, nfield=NFIELD, nemb=NEMB,
                      h=6, dropout=0.0)
    model = create_model(cfg)
    b0 = {"id": jnp.asarray(batches[0]["id"], jnp.int32),
          "value": jnp.asarray(batches[0]["value"])}
    v0 = model.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, b0, train=False)
    sd = {"linear.weight.weight": t(v0["params"]["linear"]["weight"]),
          "linear.bias": t(v0["params"]["linear"]["bias"])}
    ref_losses, ref_logits = _run_ref("lr", sd, batches)

    np.testing.assert_allclose(ours_losses, ref_losses, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(ours_logits, ref_logits, atol=2e-3, rtol=2e-3)


def test_afm_trajectory_matches_reference():
    """25 identical Adam steps on AFM (dropout=0): same loss curve and final
    eval logits — attention MLP init/semantics and the double-dropout path
    (inert at p=0) cannot be the convergence-gap cause if this holds."""
    import torch

    batches = _batches(NSTEPS, seed=11)
    state, ours_losses, ours_logits = _run_ours("afm", batches)

    def t(x):
        return torch.tensor(np.asarray(x))

    import jax.numpy as jnp
    cfg = ModelConfig(model="afm", nfeat=NFEAT, nfield=NFIELD, nemb=NEMB,
                      h=6, dropout=0.0)
    model = create_model(cfg)
    b0 = {"id": jnp.asarray(batches[0]["id"], jnp.int32),
          "value": jnp.asarray(batches[0]["value"])}
    v0 = model.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, b0, train=False)
    params = v0["params"]
    sd = {"embedding.embedding.weight": t(params["embedding"]["embedding"]),
          "linear.weight.weight": t(params["linear"]["weight"]),
          "linear.bias": t(params["linear"]["bias"])}
    for k in ("attn_w", "attn_h", "attn_p"):
        sd[f"afm.{k}.weight"] = t(params["afm"][k]["kernel"].T)
        sd[f"afm.{k}.bias"] = t(params["afm"][k]["bias"])
    ref_losses, ref_logits = _run_ref("afm", sd, batches)

    np.testing.assert_allclose(ours_losses, ref_losses, atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(ours_logits, ref_logits, atol=5e-3, rtol=5e-3)


def test_afn_trajectory_matches_reference():
    """10 identical Adam steps on AFN: the reference mutates its embedding
    table in place every forward (abs + clamp 1e-4, afn.py:74-78). This
    pins the torch-exact param_transform semantics (models/afn.py
    embedding_positivity) and the BN batch-stat updates along the
    log->linear->exp path.

    Tolerances: in float64 the two sides are bit-faithful (train-mode logits
    agree to 7e-15, BN running-stat updates to 2e-15; one-off audit, r5).
    In float32 the trajectory is chaotic — scatter-add summation order
    perturbs grads ~1e-3 near the +-1 clip boundary, Adam's step-1 update
    is sign(g)*lr (sign flips on noise), and AFN's log->linear->exp core
    amplifies — so this test runs 10 steps (vs 25 for the smooth models)
    to keep the drift bounded and the tolerances meaningful."""
    import torch

    batches = _batches(10, seed=13)
    cfg_kw = {"mlp_nlayer": 1, "mlp_nhid": 16}
    state, ours_losses, ours_logits = _run_ours("afn", batches, cfg_kw)

    def t(x):
        return torch.tensor(np.asarray(x))

    import jax.numpy as jnp
    cfg = ModelConfig(model="afn", nfeat=NFEAT, nfield=NFIELD, nemb=NEMB,
                      h=6, dropout=0.0, **cfg_kw)
    model = create_model(cfg)
    b0 = {"id": jnp.asarray(batches[0]["id"], jnp.int32),
          "value": jnp.asarray(batches[0]["value"])}
    v0 = model.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, b0, train=False)
    p = v0["params"]
    sd = {"embedding.embedding.weight": t(p["embedding"]),
          "emb_bn.weight": t(p["emb_bn"]["BatchNorm_0"]["scale"]),
          "emb_bn.bias": t(p["emb_bn"]["BatchNorm_0"]["bias"]),
          "afn.weight": t(p["afn_kernel"].T),
          "afn.bias": t(p["afn_bias"]),
          "afn_bn.weight": t(p["afn_bn"]["BatchNorm_0"]["scale"]),
          "afn_bn.bias": t(p["afn_bn"]["BatchNorm_0"]["bias"])}
    m = p["mlp"]
    sd["mlp.mlp.0.weight"] = t(m["TorchLinear_0"]["kernel"].T)
    sd["mlp.mlp.0.bias"] = t(m["TorchLinear_0"]["bias"])
    sd["mlp.mlp.1.weight"] = t(m["BatchNorm_0"]["BatchNorm_0"]["scale"])
    sd["mlp.mlp.1.bias"] = t(m["BatchNorm_0"]["BatchNorm_0"]["bias"])
    sd["mlp.mlp.4.weight"] = t(m["TorchLinear_1"]["kernel"].T)
    sd["mlp.mlp.4.bias"] = t(m["TorchLinear_1"]["bias"])
    ref_losses, ref_logits = _run_ref("afn", sd, batches,
                                      ns_kw={"mlp_nlayer": 1,
                                             "mlp_nhid": 16})

    np.testing.assert_allclose(ours_losses, ref_losses, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(ours_logits, ref_logits, atol=8e-2, rtol=8e-2)


def test_dnn_trajectory_matches_reference():
    """10 identical Adam steps on DNN (embedding -> MLP with BatchNorm):
    pins the torch-exact BN running-stat semantics (_TorchBN: unbiased
    running variance) through the MLP path every deep model shares —
    eval-mode logits read the running stats, so a biased-var store (the
    flax default this repo moved off in r5) fails this test.

    10 steps, like the afn test: embedding-bag backward carries repeated-id
    summation-order noise that Adam's step-1 sign(g) behavior amplifies
    into per-param drift (audit r5: after 25 steps run_var still matches to
    4e-6 while chaotic weight drift reaches ~1e-2)."""
    import torch

    batches = _batches(10, seed=17)
    cfg_kw = {"mlp_nlayer": 1, "mlp_nhid": 16}
    state, ours_losses, ours_logits = _run_ours("dnn", batches, cfg_kw)

    def t(x):
        return torch.tensor(np.asarray(x))

    import jax.numpy as jnp
    cfg = ModelConfig(model="dnn", nfeat=NFEAT, nfield=NFIELD, nemb=NEMB,
                      h=6, dropout=0.0, **cfg_kw)
    model = create_model(cfg)
    b0 = {"id": jnp.asarray(batches[0]["id"], jnp.int32),
          "value": jnp.asarray(batches[0]["value"])}
    v0 = model.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, b0, train=False)
    p = v0["params"]
    sd = {"embedding.embedding.weight": t(p["embedding"]["embedding"])}
    m = p["mlp"]
    sd["mlp.mlp.0.weight"] = t(m["TorchLinear_0"]["kernel"].T)
    sd["mlp.mlp.0.bias"] = t(m["TorchLinear_0"]["bias"])
    sd["mlp.mlp.1.weight"] = t(m["BatchNorm_0"]["BatchNorm_0"]["scale"])
    sd["mlp.mlp.1.bias"] = t(m["BatchNorm_0"]["BatchNorm_0"]["bias"])
    sd["mlp.mlp.4.weight"] = t(m["TorchLinear_1"]["kernel"].T)
    sd["mlp.mlp.4.bias"] = t(m["TorchLinear_1"]["bias"])
    ref_losses, ref_logits = _run_ref("dnn", sd, batches,
                                      ns_kw={"mlp_nlayer": 1,
                                             "mlp_nhid": 16})

    np.testing.assert_allclose(ours_losses, ref_losses, atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(ours_logits, ref_logits, atol=1e-2, rtol=1e-2)
