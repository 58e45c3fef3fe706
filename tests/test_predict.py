"""End-to-end inference surface: train with checkpointing on a tiny libsvm
dataset, then score it with predict.py — scores line up with input rows, the
architecture is rebuilt from checkpoint metadata alone, and the reported AUC
reflects the learned model."""

import logging
import os

import numpy as np
import pytest

import predict
from armnet_tpu.data.libsvm import BatchIterator, LibsvmDataset
from armnet_tpu.train.loop import Trainer
from armnet_tpu.utils.config import ExperimentConfig

NFIELD, NFEAT = 4, 64


def write_libsvm(path, n, seed):
    """Same learnable task as tests/test_train.py: label = field-0 id parity."""
    rng = np.random.RandomState(seed)
    per = NFEAT // NFIELD
    with open(path, "w") as f:
        for _ in range(n):
            ids = rng.randint(0, per, NFIELD) + np.arange(NFIELD) * per
            y = int(ids[0] % 2 == 0)
            f.write(f"{y} " + " ".join(f"{i}:1" for i in ids) + "\n")


@pytest.fixture
def quiet_logger():
    log = logging.getLogger("test_predict")
    log.addHandler(logging.NullHandler())
    log.propagate = False
    return log


def train_ckpt(tmp_path, quiet_logger, batch_size=64):
    tr_f, te_f = str(tmp_path / "tr.libsvm"), str(tmp_path / "te.libsvm")
    write_libsvm(tr_f, 512, seed=0)
    write_libsvm(te_f, 200, seed=1)  # 200 % 64 != 0: exercises pad masking
    cfg = ExperimentConfig(
        model="fm", nfeat=NFEAT, nfield=NFIELD, nemb=8, lr=0.03,
        batch_size=batch_size)
    loaders = [BatchIterator(LibsvmDataset(f, NFIELD, use_cache=False),
                             batch_size, shuffle=(f == tr_f))
               for f in (tr_f, te_f, te_f)]
    trainer = Trainer(cfg, *loaders, quiet_logger, seed=0,
                      ckpt_dir=str(tmp_path / "ck"))
    trainer.fit(epochs=10, patience=20)
    return te_f, str(tmp_path / "ck")


def test_predict_end_to_end(tmp_path, quiet_logger):
    te_f, ckpt = train_ckpt(tmp_path, quiet_logger)
    out = str(tmp_path / "scores.txt")
    # NOTE: no model flags passed — architecture must come from the
    # checkpoint's metadata (model=fm, nemb=8, nfeat=64, nfield=4)
    summary = predict.main(["--ckpt", ckpt, "--input", te_f,
                            "--output", out, "--batch_size", "64"])
    scores = np.loadtxt(out)
    assert summary["rows"] == 200 and scores.shape == (200,)
    assert summary["model"] == "fm" and summary["tag"] == "best"
    assert np.all((scores > 0) & (scores < 1))
    assert summary["auc"] > 0.9, f"trained model scores poorly: {summary}"

    # scores follow input-row order: recompute labels and check that
    # thresholding at the median separates classes the same way the AUC says
    labels = np.array([int(l.split()[0]) for l in open(te_f)])
    assert (scores[labels == 1].mean() > scores[labels == 0].mean())


def test_predict_tag_directory_spelling(tmp_path, quiet_logger):
    te_f, ckpt = train_ckpt(tmp_path, quiet_logger)
    summary = predict.main(["--ckpt", os.path.join(ckpt, "best"),
                            "--input", te_f, "--output", "-",
                            "--batch_size", "64"])
    assert summary["rows"] == 200 and summary["tag"] == "best"


def test_predict_explicit_flag_overrides_metadata(tmp_path, quiet_logger):
    te_f, ckpt = train_ckpt(tmp_path, quiet_logger)
    # an explicitly-typed WRONG architecture flag must win over metadata and
    # therefore fail the Orbax restore (shape mismatch) — proof the
    # precedence is CLI > checkpoint config
    with pytest.raises(Exception):
        predict.main(["--ckpt", ckpt, "--input", te_f, "--output", "-",
                      "--nemb", "16", "--batch_size", "64"])


def test_predict_multiclass(tmp_path, quiet_logger):
    """Multiclass (noutput>1) scoring: class-probability rows that sum to 1,
    accuracy reported instead of AUC."""
    per = NFEAT // NFIELD

    def write3(path, n, seed):
        r = np.random.RandomState(seed)
        with open(path, "w") as f:
            for _ in range(n):
                ids = r.randint(0, per, NFIELD) + np.arange(NFIELD) * per
                y = int(ids[0] % 3)        # 3-class, attributable to field 0
                f.write(f"{y} " + " ".join(f"{i}:1" for i in ids) + "\n")

    tr_f, te_f = str(tmp_path / "tr.libsvm"), str(tmp_path / "te.libsvm")
    write3(tr_f, 512, 0)
    write3(te_f, 200, 1)
    cfg = ExperimentConfig(model="dnn", nfeat=NFEAT, nfield=NFIELD, nemb=8,
                           mlp_nlayer=1, mlp_nhid=32, lr=0.03, noutput=3)
    loaders = [BatchIterator(LibsvmDataset(f, NFIELD, use_cache=False),
                             64, shuffle=(f == tr_f))
               for f in (tr_f, te_f, te_f)]
    trainer = Trainer(cfg, *loaders, quiet_logger, seed=0,
                      ckpt_dir=str(tmp_path / "ck"))
    trainer.fit(epochs=8, patience=20)

    out = str(tmp_path / "probs.txt")
    summary = predict.main(["--ckpt", str(tmp_path / "ck"), "--input", te_f,
                            "--output", out, "--batch_size", "64"])
    probs = np.loadtxt(out)
    assert probs.shape == (200, 3)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)
    assert "accuracy" in summary and "auc" not in summary
    assert summary["accuracy"] > 0.8, summary
