"""Model zoo: init + forward shape for every registry name, param-count parity
with the reference factory, and a weight-transplant numeric parity check on
the flagship armnet_1h."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from armnet_tpu.models import MODEL_NAMES, ModelConfig, create_model, param_count

REF = "/root/reference"

CFG = ModelConfig(
    nfeat=200, nfield=10, nemb=8, k=3, h=6, mlp_nlayer=2, mlp_nhid=16,
    dropout=0.1, nattn_head=2, ensemble=False, dnn_nlayer=1, dnn_nhid=12,
    alpha=1.7,
)


def make_batch(bsz=16, nfield=10, nfeat=200, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "id": jnp.asarray(rng.randint(0, nfeat, (bsz, nfield)), jnp.int32),
        "value": jnp.asarray(rng.rand(bsz, nfield).astype(np.float32)),
        "y": jnp.asarray(rng.randint(0, 2, (bsz,)).astype(np.float32)),
    }


def init_and_apply(model, batch, train):
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    out = model.apply(
        variables, batch, train=train,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"] if train else False)
    return variables, out


@pytest.mark.parametrize("name", MODEL_NAMES)
def test_forward_shape_eval(name):
    model = create_model(CFG.replace(model=name))
    batch = make_batch()
    _, logits = init_and_apply(model, batch, train=False)
    assert logits.shape == (16,)
    assert bool(jnp.isfinite(logits).all())


@pytest.mark.parametrize("name", ["armnet", "armnet_1h", "gc_arm", "afn", "sa_glu"])
def test_forward_train_mode_and_ensemble(name):
    model = create_model(CFG.replace(model=name, ensemble=True))
    batch = make_batch()
    _, (logits, updates) = init_and_apply(model, batch, train=True)
    assert logits.shape == (16,)
    assert "batch_stats" in updates


@pytest.mark.parametrize("name", ["armnet_1h", "fm", "dcn+"])
def test_gradients_flow(name):
    model = create_model(CFG.replace(model=name, dropout=0.0))
    batch = make_batch()
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)

    def loss_fn(params):
        logits, _ = model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            batch, train=True, rngs={"dropout": jax.random.key(2)},
            mutable=["batch_stats"])
        import optax
        return optax.sigmoid_binary_cross_entropy(logits, batch["y"]).mean()

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def _ref_args(name, cfg):
    import argparse

    a = argparse.Namespace(
        model=name, nfeat=cfg.nfeat, nfield=cfg.nfield, nemb=cfg.nemb, k=cfg.k,
        h=cfg.h, mlp_nlayer=cfg.mlp_nlayer, mlp_nhid=cfg.mlp_nhid,
        dropout=cfg.dropout, nattn_head=cfg.nattn_head, ensemble=cfg.ensemble,
        dnn_nlayer=cfg.dnn_nlayer, dnn_nhid=cfg.dnn_nhid, alpha=cfg.alpha)
    return a


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_param_count_parity_with_reference():
    import logging
    import sys

    sys.path.insert(0, REF)
    from models.model_utils import create_model as ref_create

    plogger = logging.getLogger("parity")
    plogger.addHandler(logging.NullHandler())

    mismatches = {}
    for name in MODEL_NAMES:
        cfg = CFG.replace(model=name)
        ours = create_model(cfg)
        batch = make_batch()
        variables = ours.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            batch, train=False)
        n_ours = param_count(variables["params"])

        ref = ref_create(_ref_args(name, cfg), plogger)
        n_ref = sum(p.data.nelement() for p in ref.parameters())

        # sa_glu: the reference declares an emb_bn it never uses in forward
        # (sa_glu.py:24); torch still counts its 2*nfield affine params. We
        # don't create dead params.
        if name == "sa_glu":
            n_ref -= 2 * cfg.nfield
        if n_ours != n_ref:
            mismatches[name] = (n_ours, n_ref)
    assert not mismatches, f"param count mismatches (ours, ref): {mismatches}"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_armnet_1h_numeric_parity_via_weight_transplant():
    """Transplant identical weights into both frameworks; eval-mode forward
    must agree to float tolerance (exercises embedding-bag, value clamp,
    bilinear keys, entmax gates, exp-cross, BN-eval, MLP head)."""
    import logging
    import sys

    import torch

    sys.path.insert(0, REF)
    from models.model_utils import create_model as ref_create

    cfg = CFG.replace(model="armnet_1h", dropout=0.0, mlp_nlayer=1)
    ours = create_model(cfg)
    batch = make_batch(bsz=32, nfield=cfg.nfield, nfeat=cfg.nfeat, seed=3)
    variables = ours.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    params = variables["params"]

    plogger = logging.getLogger("parity2")
    plogger.addHandler(logging.NullHandler())
    ref = ref_create(_ref_args("armnet_1h", cfg), plogger)
    ref.eval()

    def t(x):
        return torch.tensor(np.asarray(x))

    sd = {
        "embedding.embedding.weight": t(params["embedding"]["embedding"]),
        "attn_layer.bilinear_w.weight": t(params["attn_layer"]["bilinear_w"].T),
        "attn_layer.query": t(params["attn_layer"]["query"]),
        "attn_layer.values": t(params["attn_layer"]["values"]),
        "arm_bn.weight": t(params["arm_bn"]["BatchNorm_0"]["scale"]),
        "arm_bn.bias": t(params["arm_bn"]["BatchNorm_0"]["bias"]),
        "mlp.mlp.0.weight": t(params["mlp"]["TorchLinear_0"]["kernel"].T),
        "mlp.mlp.0.bias": t(params["mlp"]["TorchLinear_0"]["bias"]),
        "mlp.mlp.1.weight": t(params["mlp"]["BatchNorm_0"]["BatchNorm_0"]["scale"]),
        "mlp.mlp.1.bias": t(params["mlp"]["BatchNorm_0"]["BatchNorm_0"]["bias"]),
        "mlp.mlp.4.weight": t(params["mlp"]["TorchLinear_1"]["kernel"].T),
        "mlp.mlp.4.bias": t(params["mlp"]["TorchLinear_1"]["bias"]),
    }
    missing = set(k for k, _ in ref.state_dict().items()
                  if "running" not in k and "num_batches" not in k) - set(sd)
    assert not missing, f"unmapped reference params: {missing}"
    ref.load_state_dict(sd, strict=False)

    ours_logits = np.asarray(ours.apply(variables, batch, train=False))

    tbatch = {"id": torch.tensor(np.asarray(batch["id"], np.int64)),
              "value": torch.tensor(np.asarray(batch["value"]))}
    with torch.no_grad():
        ref_logits = ref(tbatch).numpy()

    # exp-cross + BN amplify backend float noise (entmax alone agrees at 5e-6);
    # structural wiring errors diverge at O(0.1), far above this tolerance.
    np.testing.assert_allclose(ours_logits, ref_logits, atol=2e-3, rtol=1e-2)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_armnet_multihead_numeric_parity_via_weight_transplant():
    """Multi-head ARM-Net: transplant identical weights, eval-mode forward
    must agree (exercises the [B,K,O,F] bilinear gates, per-head entmax,
    multi-head exp-cross and the K*O-channel BN; reference
    models/armnet.py:8-101)."""
    import logging
    import sys

    import torch

    sys.path.insert(0, REF)
    from models.model_utils import create_model as ref_create

    cfg = CFG.replace(model="armnet", dropout=0.0, mlp_nlayer=1)
    ours = create_model(cfg)
    batch = make_batch(bsz=32, nfield=cfg.nfield, nfeat=cfg.nfeat, seed=5)
    variables = ours.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    params = variables["params"]

    plogger = logging.getLogger("parity_mh")
    plogger.addHandler(logging.NullHandler())
    ref = ref_create(_ref_args("armnet", cfg), plogger)
    ref.eval()

    def t(x):
        return torch.tensor(np.asarray(x))

    sd = {
        "embedding.embedding.weight": t(params["embedding"]["embedding"]),
        "attn_layer.bilinear_w": t(params["attn_layer"]["bilinear_w"]),
        "attn_layer.query": t(params["attn_layer"]["query"]),
        "attn_layer.values": t(params["attn_layer"]["values"]),
        "arm_bn.weight": t(params["arm_bn"]["BatchNorm_0"]["scale"]),
        "arm_bn.bias": t(params["arm_bn"]["BatchNorm_0"]["bias"]),
        "mlp.mlp.0.weight": t(params["mlp"]["TorchLinear_0"]["kernel"].T),
        "mlp.mlp.0.bias": t(params["mlp"]["TorchLinear_0"]["bias"]),
        "mlp.mlp.1.weight": t(params["mlp"]["BatchNorm_0"]["BatchNorm_0"]["scale"]),
        "mlp.mlp.1.bias": t(params["mlp"]["BatchNorm_0"]["BatchNorm_0"]["bias"]),
        "mlp.mlp.4.weight": t(params["mlp"]["TorchLinear_1"]["kernel"].T),
        "mlp.mlp.4.bias": t(params["mlp"]["TorchLinear_1"]["bias"]),
    }
    missing = set(k for k, _ in ref.state_dict().items()
                  if "running" not in k and "num_batches" not in k) - set(sd)
    assert not missing, f"unmapped reference params: {missing}"
    ref.load_state_dict(sd, strict=False)

    ours_logits = np.asarray(ours.apply(variables, batch, train=False))
    tbatch = {"id": torch.tensor(np.asarray(batch["id"], np.int64)),
              "value": torch.tensor(np.asarray(batch["value"]))}
    with torch.no_grad():
        ref_logits = ref(tbatch).numpy()
    np.testing.assert_allclose(ours_logits, ref_logits, atol=2e-3, rtol=1e-2)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_gc_arm_numeric_parity_via_weight_transplant():
    """GC-ARM: transplant identical weights, eval-mode forward must agree
    (exercises the global-context bias on the gates, exp-BEFORE-weighting
    emb_bn path and the plain weighted sum; reference models/gc_arm.py)."""
    import logging
    import sys

    import torch

    sys.path.insert(0, REF)
    from models.model_utils import create_model as ref_create

    cfg = CFG.replace(model="gc_arm", dropout=0.0, mlp_nlayer=1)
    ours = create_model(cfg)
    batch = make_batch(bsz=32, nfield=cfg.nfield, nfeat=cfg.nfeat, seed=6)
    variables = ours.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    params = variables["params"]

    plogger = logging.getLogger("parity_gc")
    plogger.addHandler(logging.NullHandler())
    ref = ref_create(_ref_args("gc_arm", cfg), plogger)
    ref.eval()

    def t(x):
        return torch.tensor(np.asarray(x))

    sd = {
        "embedding.embedding.weight": t(params["embedding"]["embedding"]),
        "emb_bn.weight": t(params["emb_bn"]["BatchNorm_0"]["scale"]),
        "emb_bn.bias": t(params["emb_bn"]["BatchNorm_0"]["bias"]),
        "attn_layers.Q": t(params["attn_layers"]["query"]),
        "attn_layers.bilinear": t(params["attn_layers"]["bilinear"]),
        "attn_layers.values": t(params["attn_layers"]["values"]),
        "arm_bn.weight": t(params["arm_bn"]["BatchNorm_0"]["scale"]),
        "arm_bn.bias": t(params["arm_bn"]["BatchNorm_0"]["bias"]),
        "mlp.mlp.0.weight": t(params["mlp"]["TorchLinear_0"]["kernel"].T),
        "mlp.mlp.0.bias": t(params["mlp"]["TorchLinear_0"]["bias"]),
        "mlp.mlp.1.weight": t(params["mlp"]["BatchNorm_0"]["BatchNorm_0"]["scale"]),
        "mlp.mlp.1.bias": t(params["mlp"]["BatchNorm_0"]["BatchNorm_0"]["bias"]),
        "mlp.mlp.4.weight": t(params["mlp"]["TorchLinear_1"]["kernel"].T),
        "mlp.mlp.4.bias": t(params["mlp"]["TorchLinear_1"]["bias"]),
    }
    missing = set(k for k, _ in ref.state_dict().items()
                  if "running" not in k and "num_batches" not in k) - set(sd)
    assert not missing, f"unmapped reference params: {missing}"
    ref.load_state_dict(sd, strict=False)

    ours_logits = np.asarray(ours.apply(variables, batch, train=False))
    tbatch = {"id": torch.tensor(np.asarray(batch["id"], np.int64)),
              "value": torch.tensor(np.asarray(batch["value"]))}
    with torch.no_grad():
        ref_logits = ref(tbatch).numpy()
    np.testing.assert_allclose(ours_logits, ref_logits, atol=2e-3, rtol=1e-2)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_afn_numeric_parity_via_weight_transplant():
    """AFN: transplant identical weights, eval-mode forward must agree —
    exercises the positivity reparametrization (the reference mutates the
    table in place each forward via abs+clamp, models/afn.py:74-78; we
    read clip(|W|, 1e-4) — same effective values), the log->BN->Linear->
    exp->BN chain and both transposes."""
    import logging
    import sys

    import torch

    sys.path.insert(0, REF)
    from models.model_utils import create_model as ref_create

    cfg = CFG.replace(model="afn", dropout=0.0, mlp_nlayer=1)
    ours = create_model(cfg)
    batch = make_batch(bsz=32, nfield=cfg.nfield, nfeat=cfg.nfeat, seed=9)
    variables = ours.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    params = variables["params"]

    plogger = logging.getLogger("parity_afn")
    plogger.addHandler(logging.NullHandler())
    ref = ref_create(_ref_args("afn", cfg), plogger)
    ref.eval()

    def t(x):
        return torch.tensor(np.asarray(x))

    sd = {
        "embedding.embedding.weight": t(params["embedding"]),
        "emb_bn.weight": t(params["emb_bn"]["BatchNorm_0"]["scale"]),
        "emb_bn.bias": t(params["emb_bn"]["BatchNorm_0"]["bias"]),
        "afn.weight": t(params["afn_kernel"].T),
        "afn.bias": t(params["afn_bias"]),
        "afn_bn.weight": t(params["afn_bn"]["BatchNorm_0"]["scale"]),
        "afn_bn.bias": t(params["afn_bn"]["BatchNorm_0"]["bias"]),
        "mlp.mlp.0.weight": t(params["mlp"]["TorchLinear_0"]["kernel"].T),
        "mlp.mlp.0.bias": t(params["mlp"]["TorchLinear_0"]["bias"]),
        "mlp.mlp.1.weight": t(params["mlp"]["BatchNorm_0"]["BatchNorm_0"]["scale"]),
        "mlp.mlp.1.bias": t(params["mlp"]["BatchNorm_0"]["BatchNorm_0"]["bias"]),
        "mlp.mlp.4.weight": t(params["mlp"]["TorchLinear_1"]["kernel"].T),
        "mlp.mlp.4.bias": t(params["mlp"]["TorchLinear_1"]["bias"]),
    }
    missing = set(k for k, _ in ref.state_dict().items()
                  if "running" not in k and "num_batches" not in k) - set(sd)
    assert not missing, f"unmapped reference params: {missing}"
    ref.load_state_dict(sd, strict=False)

    ours_logits = np.asarray(ours.apply(variables, batch, train=False))
    tbatch = {"id": torch.tensor(np.asarray(batch["id"], np.int64)),
              "value": torch.tensor(np.asarray(batch["value"]))}
    with torch.no_grad():
        ref_logits = ref(tbatch).numpy()
    np.testing.assert_allclose(ours_logits, ref_logits, atol=2e-3, rtol=1e-2)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_cin_numeric_parity_via_weight_transplant():
    """CIN (xDeepFM's compressed interaction): transplant identical
    weights, forward must agree — exercises the outer-product/1x1-conv
    chain (our batched-einsum formulation vs torch Conv1d, reference
    models/xdfm.py:5-35) and the first-order Linear."""
    import logging
    import sys

    import torch

    sys.path.insert(0, REF)
    from models.model_utils import create_model as ref_create

    cfg = CFG.replace(model="cin", dropout=0.0)
    ours = create_model(cfg)
    batch = make_batch(bsz=32, nfield=cfg.nfield, nfeat=cfg.nfeat, seed=11)
    variables = ours.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    params = variables["params"]

    plogger = logging.getLogger("parity_cin")
    plogger.addHandler(logging.NullHandler())
    ref = ref_create(_ref_args("cin", cfg), plogger)
    ref.eval()

    def t(x):
        return torch.tensor(np.asarray(x))

    sd = {
        "embedding.embedding.weight": t(params["embedding"]["embedding"]),
        "linear.weight.weight": t(params["linear"]["weight"]),
        "linear.bias": t(params["linear"]["bias"]),
        "cin.affine.weight": t(params["cin"]["affine"]["kernel"].T),
    }
    ncin = len([k for k in params["cin"] if k.startswith("filter_")])
    for k in range(ncin):
        # torch Conv1d weight [out, in, 1] <- ours [in, out]
        sd[f"cin.filters.{k}.weight"] = t(
            params["cin"][f"filter_{k}"].T[..., None])
    missing = set(k for k, _ in ref.state_dict().items()
                  if "running" not in k and "num_batches" not in k) - set(sd)
    assert not missing, f"unmapped reference params: {missing}"
    ref.load_state_dict(sd, strict=False)

    ours_logits = np.asarray(ours.apply(variables, batch, train=False))
    tbatch = {"id": torch.tensor(np.asarray(batch["id"], np.int64)),
              "value": torch.tensor(np.asarray(batch["value"]))}
    with torch.no_grad():
        ref_logits = ref(tbatch).numpy()
    np.testing.assert_allclose(ours_logits, ref_logits, atol=1e-4, rtol=1e-4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_sa_glu_numeric_parity_via_weight_transplant():
    """SA-GLU: transplant identical weights, eval-mode forward must agree
    — exercises the dual self-attention branches and the GLU gate. The
    reference declares an emb_bn it never calls in forward
    (models/sa_glu.py:19,37-50); its keys are excluded from the mapped
    set, matching our implementation which omits the dead layer."""
    import logging
    import sys

    import torch

    sys.path.insert(0, REF)
    from models.model_utils import create_model as ref_create

    cfg = CFG.replace(model="sa_glu", dropout=0.0, mlp_nlayer=1)
    ours = create_model(cfg)
    batch = make_batch(bsz=32, nfield=cfg.nfield, nfeat=cfg.nfeat, seed=13)
    variables = ours.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    params = variables["params"]

    plogger = logging.getLogger("parity_saglu")
    plogger.addHandler(logging.NullHandler())
    ref = ref_create(_ref_args("sa_glu", cfg), plogger)
    ref.eval()

    def t(x):
        return torch.tensor(np.asarray(x))

    sd = {
        "embedding.embedding.weight": t(params["embedding"]["embedding"]),
        "w_b": t(params["w_b"]),
        "v_b": t(params["v_b"]),
        "mlp.mlp.0.weight": t(params["mlp"]["TorchLinear_0"]["kernel"].T),
        "mlp.mlp.0.bias": t(params["mlp"]["TorchLinear_0"]["bias"]),
        "mlp.mlp.1.weight": t(params["mlp"]["BatchNorm_0"]["BatchNorm_0"]["scale"]),
        "mlp.mlp.1.bias": t(params["mlp"]["BatchNorm_0"]["BatchNorm_0"]["bias"]),
        "mlp.mlp.4.weight": t(params["mlp"]["TorchLinear_1"]["kernel"].T),
        "mlp.mlp.4.bias": t(params["mlp"]["TorchLinear_1"]["bias"]),
    }
    for branch in ("self_attn_w", "self_attn_v"):
        for i, wname in enumerate(("Wq", "Wk", "Wv")):
            sd[f"{branch}.{wname}.weight"] = t(
                params[branch][f"TorchLinear_{i}"]["kernel"].T)
    missing = set(k for k, _ in ref.state_dict().items()
                  if "running" not in k and "num_batches" not in k
                  and not k.startswith("emb_bn")) - set(sd)
    assert not missing, f"unmapped reference params: {missing}"
    ref.load_state_dict(sd, strict=False)

    ours_logits = np.asarray(ours.apply(variables, batch, train=False))
    tbatch = {"id": torch.tensor(np.asarray(batch["id"], np.int64)),
              "value": torch.tensor(np.asarray(batch["value"]))}
    with torch.no_grad():
        ref_logits = ref(tbatch).numpy()
    np.testing.assert_allclose(ours_logits, ref_logits, atol=1e-4, rtol=1e-4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_hofm_numeric_parity_via_weight_transplant():
    """HOFM: transplant identical weights, forward must agree — exercises
    the order-sliced [F, E*(k-1)] embedding, FM pooling and the ANOVA
    kernel dynamic program for orders 3..k (reference models/hofm.py).
    No BN/dropout in this model, so tolerance is tight."""
    import logging
    import sys

    import torch

    sys.path.insert(0, REF)
    from models.model_utils import create_model as ref_create

    cfg = CFG.replace(model="hofm")        # k=3: FM + one ANOVA order
    ours = create_model(cfg)
    batch = make_batch(bsz=32, nfield=cfg.nfield, nfeat=cfg.nfeat, seed=17)
    variables = ours.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    params = variables["params"]

    plogger = logging.getLogger("parity_hofm")
    plogger.addHandler(logging.NullHandler())
    ref = ref_create(_ref_args("hofm", cfg), plogger)
    ref.eval()

    def t(x):
        return torch.tensor(np.asarray(x))

    sd = {
        "embedding.embedding.weight": t(params["embedding"]["embedding"]),
        "linear.weight.weight": t(params["linear"]["weight"]),
        "linear.bias": t(params["linear"]["bias"]),
    }
    missing = set(k for k, _ in ref.state_dict().items()
                  if "running" not in k and "num_batches" not in k) - set(sd)
    assert not missing, f"unmapped reference params: {missing}"
    ref.load_state_dict(sd, strict=False)

    ours_logits = np.asarray(ours.apply(variables, batch, train=False))
    tbatch = {"id": torch.tensor(np.asarray(batch["id"], np.int64)),
              "value": torch.tensor(np.asarray(batch["value"]))}
    with torch.no_grad():
        ref_logits = ref(tbatch).numpy()
    np.testing.assert_allclose(ours_logits, ref_logits, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# r3 transplant coverage extension (VERDICT r2 weak #5): the remaining
# subtle-transcription models — afm's attention MLP, kpnn's bilinear kernel,
# gat's head-stacked scorer, gcn's einsum chain, dcn+'s cross/deep concat,
# xdfm's linear+CIN+MLP sum — where sign/axis errors pass shape tests.
# ---------------------------------------------------------------------------

def _transplant_compare(name, seed, build_sd, cfg_kw=None, atol=1e-4,
                        rtol=1e-4):
    """Shared transplant harness: init ours, map params into the torch
    reference via build_sd(params, t), compare eval-mode logits."""
    import logging
    import sys

    import torch

    sys.path.insert(0, REF)
    from models.model_utils import create_model as ref_create

    cfg = CFG.replace(model=name, dropout=0.0, **(cfg_kw or {}))
    ours = create_model(cfg)
    batch = make_batch(bsz=32, nfield=cfg.nfield, nfeat=cfg.nfeat, seed=seed)
    variables = ours.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    params = variables["params"]

    plogger = logging.getLogger(f"parity_{name}")
    plogger.addHandler(logging.NullHandler())
    ref = ref_create(_ref_args(name, cfg), plogger)
    ref.eval()

    def t(x):
        return torch.tensor(np.asarray(x))

    sd = build_sd(params, t)
    missing = set(k for k, _ in ref.state_dict().items()
                  if "running" not in k and "num_batches" not in k) - set(sd)
    assert not missing, f"unmapped reference params: {missing}"
    ref.load_state_dict(sd, strict=False)

    ours_logits = np.asarray(ours.apply(variables, batch, train=False))
    tbatch = {"id": torch.tensor(np.asarray(batch["id"], np.int64)),
              "value": torch.tensor(np.asarray(batch["value"]))}
    with torch.no_grad():
        ref_logits = ref(tbatch).numpy()
    np.testing.assert_allclose(ours_logits, ref_logits, atol=atol, rtol=rtol)


def _map_mlp(sd, prefix, m, t):
    """Our MLP(nlayer=1) tree -> reference mlp.{0 Linear,1 BN,4 Linear}."""
    sd[f"{prefix}.0.weight"] = t(m["TorchLinear_0"]["kernel"].T)
    sd[f"{prefix}.0.bias"] = t(m["TorchLinear_0"]["bias"])
    sd[f"{prefix}.1.weight"] = t(m["BatchNorm_0"]["BatchNorm_0"]["scale"])
    sd[f"{prefix}.1.bias"] = t(m["BatchNorm_0"]["BatchNorm_0"]["bias"])
    sd[f"{prefix}.4.weight"] = t(m["TorchLinear_1"]["kernel"].T)
    sd[f"{prefix}.4.bias"] = t(m["TorchLinear_1"]["bias"])


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_afm_numeric_parity_via_weight_transplant():
    """AFM: relu->softmax attention over hadamard pairs + projection
    (reference models/afm.py:5-48)."""
    def build(params, t):
        sd = {
            "embedding.embedding.weight": t(params["embedding"]["embedding"]),
            "linear.weight.weight": t(params["linear"]["weight"]),
            "linear.bias": t(params["linear"]["bias"]),
        }
        for k in ("attn_w", "attn_h", "attn_p"):
            sd[f"afm.{k}.weight"] = t(params["afm"][k]["kernel"].T)
            sd[f"afm.{k}.bias"] = t(params["afm"][k]["bias"])
        return sd

    _transplant_compare("afm", 21, build)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_kpnn_numeric_parity_via_weight_transplant():
    """KPNN: learned [E, P, E] bilinear kernel per triu pair
    (reference models/pnn.py:41-58)."""
    def build(params, t):
        sd = {
            "embedding.embedding.weight": t(params["embedding"]["embedding"]),
            "pnn.kernel": t(params["kernel"]),
        }
        _map_mlp(sd, "mlp.mlp", params["mlp"], t)
        return sd

    _transplant_compare("kpnn", 22, build, cfg_kw={"mlp_nlayer": 1})


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_gat_numeric_parity_via_weight_transplant():
    """GAT: our stacked-head einsum + split a_src/a_dst scorer vs the
    reference's per-head loop over pair-concat Linears (models/gat.py:6-48,
    incl. the multiplicative adj mask quirk)."""
    def build(params, t):
        sd = {"embedding.embedding.weight":
              t(params["embedding"]["embedding"])}
        nlayer = len([k for k in params if k.startswith("gat_")])
        for l in range(nlayer):
            W = params[f"gat_{l}"]["W"]                # [H, in, out]
            a = params[f"gat_{l}"]["a"]                # [H, 2*out]
            for h in range(W.shape[0]):
                sd[f"gats.{l}.W.{h}"] = t(W[h])
                sd[f"gats.{l}.a.{h}.weight"] = t(a[h][None, :])
        _map_mlp(sd, "affine.mlp", params["affine"], t)
        return sd

    _transplant_compare("gat", 23, build, cfg_kw={"mlp_nlayer": 1},
                        atol=5e-4, rtol=5e-4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_gcn_numeric_parity_via_weight_transplant():
    """GCN: per-forward symmetric adj normalization + einsum chain
    (reference models/gcn.py:14-75)."""
    def build(params, t):
        sd = {"embedding.embedding.weight":
              t(params["embedding"]["embedding"])}
        nlayer = len([k for k in params if k.startswith("gcn_")])
        for l in range(nlayer):
            sd[f"gcns.{l}.weight"] = t(params[f"gcn_{l}"]["weight"])
            sd[f"gcns.{l}.bias"] = t(params[f"gcn_{l}"]["bias"])
        _map_mlp(sd, "affine.mlp", params["affine"], t)
        return sd

    _transplant_compare("gcn", 24, build, cfg_kw={"mlp_nlayer": 1})


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_dcn_plus_numeric_parity_via_weight_transplant():
    """DCN+: cross layers x0*(w^T x)+b+x in parallel with an MLP whose final
    width is mlp_nhid, concat -> unbiased linear (reference dcn.py:49-71)."""
    def build(params, t):
        sd = {"embedding.embedding.weight":
              t(params["embedding"]["embedding"]),
              "w.weight": t(params["w"]["kernel"].T)}
        cn = params["cross_net"]
        nl = len([k for k in cn if k.startswith("w_")])
        for l in range(nl):
            sd[f"cross_net.w.{l}.weight"] = t(cn[f"w_{l}"].T)
            sd[f"cross_net.b.{l}"] = t(cn[f"b_{l}"])
        _map_mlp(sd, "mlp.mlp", params["mlp"], t)
        return sd

    _transplant_compare("dcn+", 25, build, cfg_kw={"mlp_nlayer": 1})


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_xdfm_numeric_parity_via_weight_transplant():
    """xDeepFM: linear + CIN + MLP sum (reference models/xdfm.py:58-80)."""
    def build(params, t):
        sd = {
            "embedding.embedding.weight": t(params["embedding"]["embedding"]),
            "linear.weight.weight": t(params["linear"]["weight"]),
            "linear.bias": t(params["linear"]["bias"]),
            "cin.affine.weight": t(params["cin"]["affine"]["kernel"].T),
        }
        ncin = len([k for k in params["cin"] if k.startswith("filter_")])
        for k in range(ncin):
            sd[f"cin.filters.{k}.weight"] = t(
                params["cin"][f"filter_{k}"].T[..., None])
        _map_mlp(sd, "mlp.mlp", params["mlp"], t)
        return sd

    _transplant_compare("xdfm", 26, build, cfg_kw={"mlp_nlayer": 1})


# ---------------------------------------------------------------------------
# r3: transplant coverage completion — the remaining simple models, so every
# one of the 21 zoo entries is weight-transplant-verified against the torch
# reference (not just param-count/shape-checked).
# ---------------------------------------------------------------------------

def _map_linear_head(sd, params, t):
    """Reference LR head: linear.weight is an Embedding over features."""
    sd["linear.weight.weight"] = t(params["linear"]["weight"])
    sd["linear.bias"] = t(params["linear"]["bias"])


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_lr_numeric_parity_via_weight_transplant():
    """LR: per-feature weight lookup * value + bias (reference models/lr.py)."""
    def build(params, t):
        sd = {}
        _map_linear_head(sd, params, t)
        return sd

    _transplant_compare("lr", 31, build)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_fm_numeric_parity_via_weight_transplant():
    """FM: linear + sum-square pooling (reference models/fm.py)."""
    def build(params, t):
        sd = {"embedding.embedding.weight": t(params["embedding"]["embedding"])}
        _map_linear_head(sd, params, t)
        return sd

    _transplant_compare("fm", 32, build)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_dcn_base_numeric_parity_via_weight_transplant():
    """DCN (base CrossNet): k cross layers then an unbiased linear readout,
    no deep branch (reference models/dcn.py:5-46)."""
    def build(params, t):
        sd = {"embedding.embedding.weight": t(params["embedding"]["embedding"]),
              "w.weight": t(params["w"]["kernel"].T)}
        cn = params["cross_net"]
        nl = len([k for k in cn if k.startswith("w_")])
        for l in range(nl):
            sd[f"cross_net.w.{l}.weight"] = t(cn[f"w_{l}"].T)
            sd[f"cross_net.b.{l}"] = t(cn[f"b_{l}"])
        return sd

    _transplant_compare("dcn", 33, build)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_dnn_numeric_parity_via_weight_transplant():
    """DNN: flattened embeddings -> MLP (reference models/dnn.py)."""
    def build(params, t):
        sd = {"embedding.embedding.weight": t(params["embedding"]["embedding"])}
        _map_mlp(sd, "mlp.mlp", params["mlp"], t)
        return sd

    _transplant_compare("dnn", 34, build, cfg_kw={"mlp_nlayer": 1})


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_wd_numeric_parity_via_weight_transplant():
    """Wide&Deep: linear (wide) + MLP over flat embeddings (deep), summed
    (reference models/wd.py)."""
    def build(params, t):
        sd = {"embedding.embedding.weight": t(params["embedding"]["embedding"])}
        _map_linear_head(sd, params, t)
        _map_mlp(sd, "mlp.mlp", params["mlp"], t)
        return sd

    _transplant_compare("wd", 35, build, cfg_kw={"mlp_nlayer": 1})


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_ipnn_numeric_parity_via_weight_transplant():
    """IPNN: inner products over triu pairs concat flat embeddings -> MLP
    (reference models/pnn.py:5-39)."""
    def build(params, t):
        sd = {"embedding.embedding.weight": t(params["embedding"]["embedding"])}
        _map_mlp(sd, "mlp.mlp", params["mlp"], t)
        return sd

    _transplant_compare("ipnn", 36, build, cfg_kw={"mlp_nlayer": 1})


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_nfm_numeric_parity_via_weight_transplant():
    """NFM: linear + BN'd FM pooling -> MLP (reference models/nfm.py, where
    fm.1 is the BatchNorm1d over the pooled [B, E] vector)."""
    def build(params, t):
        sd = {"embedding.embedding.weight": t(params["embedding"]["embedding"]),
              "fm.1.weight": t(params["fm_bn"]["BatchNorm_0"]["scale"]),
              "fm.1.bias": t(params["fm_bn"]["BatchNorm_0"]["bias"])}
        _map_linear_head(sd, params, t)
        _map_mlp(sd, "mlp.mlp", params["mlp"], t)
        return sd

    _transplant_compare("nfm", 37, build, cfg_kw={"mlp_nlayer": 1})


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_dfm_numeric_parity_via_weight_transplant():
    """DeepFM: linear + FM pooling (no BN) + MLP, summed
    (reference models/dfm.py)."""
    def build(params, t):
        sd = {"embedding.embedding.weight": t(params["embedding"]["embedding"])}
        _map_linear_head(sd, params, t)
        _map_mlp(sd, "mlp.mlp", params["mlp"], t)
        return sd

    _transplant_compare("dfm", 38, build, cfg_kw={"mlp_nlayer": 1})
