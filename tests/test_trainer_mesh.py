"""Trainer over a ('data','model') mesh with row-sharded embeddings: the
full fit() loop runs sharded on the 8-device CPU mesh and still learns."""

import logging

import numpy as np
import pytest

from armnet_tpu.data.libsvm import BatchIterator
from armnet_tpu.train.loop import Trainer
from armnet_tpu.utils.config import ExperimentConfig


class SyntheticDataset:
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


@pytest.fixture
def quiet_logger():
    log = logging.getLogger("test_trainer_mesh")
    log.addHandler(logging.NullHandler())
    log.propagate = False
    return log


@pytest.mark.parametrize("exchange", ["psum", "a2a"])
def test_sharded_trainer_learns(quiet_logger, exchange):
    cfg = ExperimentConfig(
        model="armnet_1h", nfeat=64, nfield=4, nemb=8, h=8, mlp_nlayer=1,
        mlp_nhid=16, alpha=1.7, lr=0.01, mesh="data:4,model:2",
        shard_embedding=True)
    cfg.embedding_exchange = exchange
    tr = BatchIterator(SyntheticDataset(512, seed=0), 64, True, seed=1)
    va = BatchIterator(SyntheticDataset(256, seed=1), 64, False)
    te = BatchIterator(SyntheticDataset(256, seed=2), 64, False)
    trainer = Trainer(cfg, tr, va, te, quiet_logger, seed=0)

    from jax.sharding import PartitionSpec as P
    emb = trainer.state.params["embedding"]["embedding"]
    assert emb.sharding.spec == P("model", None)

    best_valid, _ = trainer.fit(epochs=6, patience=10)
    assert best_valid > 0.95, f"sharded trainer failed to learn: {best_valid}"


def test_dp_only_mesh_trainer(quiet_logger):
    cfg = ExperimentConfig(
        model="fm", nfeat=64, nfield=4, nemb=8, lr=0.01, mesh="data:8")
    tr = BatchIterator(SyntheticDataset(512, seed=0), 64, True, seed=1)
    va = BatchIterator(SyntheticDataset(256, seed=1), 64, False)
    te = BatchIterator(SyntheticDataset(256, seed=2), 64, False)
    trainer = Trainer(cfg, tr, va, te, quiet_logger, seed=0)
    # 10 epochs (was 6): FeaturesLinear now starts N(0,1) for reference
    # init parity (r4), which takes a few extra epochs to settle on this
    # tiny synthetic task — the reference's own fm starts the same way
    best_valid, _ = trainer.fit(epochs=10, patience=10)
    assert best_valid > 0.95


def test_checkpoint_roundtrip_under_mesh(tmp_path, quiet_logger):
    """Sharded-state checkpointing: save passes live sharded arrays to
    Orbax and restore rebuilds them with their original shardings (the r2
    multi-host checkpoint path; a device_get-based save would fail on
    non-addressable shards in real multi-process runs)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from armnet_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    cfg = ExperimentConfig(
        model="armnet_1h", nfeat=64, nfield=4, nemb=8, h=8, mlp_nlayer=1,
        mlp_nhid=16, alpha=2.0, lr=0.01, mesh="data:4,model:2",
        shard_embedding=True)
    tr = BatchIterator(SyntheticDataset(256, seed=0), 64, True, seed=1)
    va = BatchIterator(SyntheticDataset(128, seed=1), 64, False)
    te = BatchIterator(SyntheticDataset(128, seed=2), 64, False)
    trainer = Trainer(cfg, tr, va, te, quiet_logger, seed=0)
    trainer.fit(epochs=1, patience=10)

    save_checkpoint(str(tmp_path / "ck"), trainer.state,
                    extra={"epoch": 0}, is_best=False)

    fresh = Trainer(cfg, tr, va, te, quiet_logger, seed=123)
    restored, extra = load_checkpoint(str(tmp_path / "ck"), fresh.state)
    assert extra["epoch"] == 0
    emb = restored.params["embedding"]["embedding"]
    assert emb.sharding.spec == P("model", None)   # sharding survives
    a = jax.tree.leaves(trainer.state.params)
    b = jax.tree.leaves(restored.params)
    assert all(bool(jnp.allclose(x, y)) for x, y in zip(a, b))
