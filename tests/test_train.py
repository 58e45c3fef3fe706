"""Training loop on a learnable synthetic task (CPU): AUC improves, early
stopping & eval_freq semantics hold, checkpoint save/restore round-trips."""

import numpy as np
import pytest

from armnet_tpu.data.libsvm import BatchIterator
from armnet_tpu.train.loop import Trainer
from armnet_tpu.utils.config import ExperimentConfig
from armnet_tpu.utils.logging import get_logger


class SyntheticDataset:
    """Labels determined by whether the field-0 feature id is even.
    Per-field id ranges are disjoint (like real CTR vocabularies), so the
    signal is cleanly attributable and any embedding model can learn it."""

    def __init__(self, n, nfield=4, nfeat=64, seed=0):
        rng = np.random.RandomState(seed)
        per = nfeat // nfield
        base = (np.arange(nfield) * per)[None, :]
        self.ids = (rng.randint(0, per, (n, nfield)) + base).astype(np.int32)
        self.values = np.ones((n, nfield), np.float32)
        self.labels = (self.ids[:, 0] % 2 == 0).astype(np.float32)
        self.nfield = nfield

    def __len__(self):
        return self.labels.shape[0]


def make_loaders(bsz=64):
    tr = BatchIterator(SyntheticDataset(512, seed=0), bsz, True, seed=1)
    va = BatchIterator(SyntheticDataset(256, seed=1), bsz, False)
    te = BatchIterator(SyntheticDataset(256, seed=2), bsz, False)
    return tr, va, te


@pytest.fixture
def quiet_logger():
    import logging

    log = logging.getLogger("test_train")
    log.addHandler(logging.NullHandler())
    log.propagate = False
    return log


@pytest.mark.parametrize("model", ["armnet_1h", "fm"])
def test_training_learns(model, quiet_logger):
    cfg = ExperimentConfig(
        model=model, nfeat=64, nfield=4, nemb=8, h=8, mlp_nlayer=1,
        mlp_nhid=16, alpha=1.7, lr=0.01, epoch=10, patience=10)
    tr, va, te = make_loaders()
    trainer = Trainer(cfg, tr, va, te, quiet_logger, seed=0)
    # 10 epochs, not 6: the N(0,1) first-order weight (reference init
    # parity, ops/layers.FeaturesLinear) settles slower on this tiny task —
    # same adjustment test_trainer_mesh made when the init landed
    best_valid, best_test = trainer.fit(epochs=10, patience=10)
    assert best_valid > 0.95, f"{model} failed to learn: {best_valid}"
    assert best_test > 0.9


def test_eval_freq_caps_batches(quiet_logger):
    from armnet_tpu.train.loop import run_epoch
    from armnet_tpu.train.step import make_eval_step

    cfg = ExperimentConfig(model="lr", nfeat=64, nfield=4, lr=0.01)
    tr, va, te = make_loaders(bsz=32)  # 512/32 = 16 batches
    trainer = Trainer(cfg, tr, va, te, quiet_logger, seed=0)

    seen = []

    class CountingLoader:
        def __len__(self):
            return len(tr)

        def __iter__(self):
            for i, b in enumerate(tr):
                seen.append(i)
                yield b

    run_epoch(0, trainer.state, CountingLoader(), quiet_logger,
              eval_step=make_eval_step(), eval_freq=3)
    # reference semantics: break AFTER processing batch_idx == eval_freq
    assert len(seen) == 4


def test_checkpoint_roundtrip(tmp_path, quiet_logger):
    import jax
    import jax.numpy as jnp

    from armnet_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    cfg = ExperimentConfig(model="armnet_1h", nfeat=64, nfield=4, nemb=8, h=8,
                           mlp_nlayer=1, mlp_nhid=16, lr=0.01)
    tr, va, te = make_loaders()
    trainer = Trainer(cfg, tr, va, te, quiet_logger, seed=0)
    trainer.fit(epochs=1, patience=10)

    path = save_checkpoint(str(tmp_path / "ck"), trainer.state,
                           extra={"epoch": 0, "valid_auc": 0.5}, is_best=True)
    assert path

    fresh = Trainer(cfg, tr, va, te, quiet_logger, seed=99)
    restored, extra = load_checkpoint(str(tmp_path / "ck"), fresh.state,
                                      tag="best")
    assert extra["epoch"] == 0
    a = jax.tree.leaves(trainer.state.params)
    b = jax.tree.leaves(restored.params)
    assert all(bool(jnp.allclose(x, y)) for x, y in zip(a, b))

    batch = next(iter(va))
    from armnet_tpu.train.step import init_meters, make_eval_step
    ev = make_eval_step()
    m1 = jax.device_get(ev(trainer.state, init_meters(), batch))
    m2 = jax.device_get(ev(restored, init_meters(), batch))
    assert abs(m1["loss_last"] - m2["loss_last"]) < 1e-6


def test_cli_parser_reference_flags():
    from armnet_tpu.utils.config import get_args

    args = get_args(["--model", "armnet_1h", "--nfeat", "5500", "--h", "16",
                     "--alpha", "2.0", "--ensemble", "--eval_freq", "1000"])
    assert args.model == "armnet_1h" and args.nfeat == 5500
    assert args.h == 16 and args.alpha == 2.0 and args.ensemble
    assert args.eval_freq == 1000


def test_bf16_compute_dtype_trains():
    """--bf16 path: activations flow in bfloat16 (loss/metrics stay f32),
    training still reduces the loss."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from armnet_tpu.kernels.config import set_compute_dtype
    from armnet_tpu.models import create_model
    from armnet_tpu.models.config import ModelConfig
    from armnet_tpu.train.step import (create_train_state, init_meters,
                                       make_train_step)

    rng = np.random.RandomState(0)
    batch = {"id": jnp.asarray(rng.randint(0, 900, (64, 8)), jnp.int32),
             "value": jnp.ones((64, 8), jnp.float32),
             "y": jnp.asarray(rng.randint(0, 2, (64,)).astype(np.float32)),
             "mask": jnp.ones((64,), jnp.float32)}
    try:
        set_compute_dtype("bfloat16")
        cfg = ModelConfig(model="armnet_1h", nfeat=900, nfield=8, nemb=8,
                          h=16, mlp_nlayer=1, mlp_nhid=32, alpha=1.7)
        model = create_model(cfg)
        # the embedding output really is bf16
        var = model.init({"params": jax.random.key(0),
                          "dropout": jax.random.key(1)}, batch, train=False)
        state = create_train_state(model, batch, lr=0.01, seed=0)
        step = make_train_step()
        meters = init_meters()
        key = jax.random.key(0)
        state, meters = step(state, meters, batch, key)
        first = float(meters["loss_last"])
        for _ in range(30):
            state, meters = step(state, meters, batch, key)
        last = float(meters["loss_last"])
    finally:
        set_compute_dtype("float32")
    assert np.isfinite(last) and last < first


def test_debug_nans_flag_plumbing(quiet_logger):
    """--debug_nans flips jax_debug_nans via the Trainer (SURVEY §5 NaN
    tooling row)."""
    import jax

    assert not jax.config.jax_debug_nans
    cfg = ExperimentConfig(model="lr", nfeat=64, nfield=4, lr=0.01)
    cfg.debug_nans = True
    tr, va, te = make_loaders()
    try:
        trainer = Trainer(cfg, tr, va, te, quiet_logger, seed=0)
        assert jax.config.jax_debug_nans
        # and a normal step still runs under the checker
        trainer.fit(epochs=1, patience=10)
    finally:
        jax.config.update("jax_debug_nans", False)


def test_every_preset_parses_and_builds_a_model():
    """Regression guard against the reference's run.sh failure class (its
    recipes pass flags that don't exist in the CLI — SURVEY §2 row 19):
    every preset must parse through the real argparse surface AND name a
    constructible model config."""
    from armnet_tpu.models import create_model
    from armnet_tpu.utils.config import get_args
    from armnet_tpu.utils.presets import PRESETS, expand

    for name in PRESETS:
        args = get_args(expand(name))          # SystemExit on a stale flag
        assert args.exp_name == name
        model = create_model(args)             # registry + config sanity
        assert model is not None


def test_metrics_jsonl_rows(tmp_path, quiet_logger):
    """Structured per-epoch metrics (SURVEY §5): one JSON row per epoch with
    the split AUCs, best tracking, and wall time."""
    import json

    cfg = ExperimentConfig(model="fm", nfeat=64, nfield=4, nemb=8, lr=0.01)
    tr, va, te = make_loaders()
    path = str(tmp_path / "metrics.jsonl")
    trainer = Trainer(cfg, tr, va, te, quiet_logger, seed=0,
                      metrics_path=path)
    trainer.fit(epochs=3, patience=10)
    rows = [json.loads(l) for l in open(path)]
    assert len(rows) == 3
    assert [r["epoch"] for r in rows] == [0, 1, 2]
    for r in rows:
        assert set(r) >= {"train", "valid", "test", "best_valid", "is_best",
                          "metric", "time_s", "seed"}
        assert 0.0 <= r["valid"] <= 1.0 and r["time_s"] > 0
    # best_valid is a running max over epochs
    assert rows[-1]["best_valid"] == max(r["valid"] for r in rows)
