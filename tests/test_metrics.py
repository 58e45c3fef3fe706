"""On-device ROC-AUC vs sklearn (tie handling, masks, degenerate batches)."""

import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.metrics import roc_auc_score

from armnet_tpu.train.metrics import masked_bce, masked_roc_auc


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_auc_matches_sklearn(seed):
    rng = np.random.RandomState(seed)
    logits = rng.randn(1000).astype(np.float32)
    labels = (rng.rand(1000) < 0.3).astype(np.float32)
    ours = float(masked_roc_auc(jnp.asarray(logits), jnp.asarray(labels)))
    ref = roc_auc_score(labels, logits)
    assert abs(ours - ref) < 1e-5


def test_auc_with_ties_matches_sklearn():
    rng = np.random.RandomState(3)
    logits = rng.randint(0, 5, 500).astype(np.float32)  # heavy ties
    labels = (rng.rand(500) < 0.4).astype(np.float32)
    ours = float(masked_roc_auc(jnp.asarray(logits), jnp.asarray(labels)))
    ref = roc_auc_score(labels, logits)
    assert abs(ours - ref) < 1e-5


def test_auc_mask_excludes_padding():
    rng = np.random.RandomState(4)
    logits = rng.randn(256).astype(np.float32)
    labels = (rng.rand(256) < 0.5).astype(np.float32)
    mask = np.ones(256, np.float32)
    mask[200:] = 0.0
    # garbage in the padded region must not affect the result
    logits_p = logits.copy()
    logits_p[200:] = 99.0
    labels_p = labels.copy()
    labels_p[200:] = 1.0
    ours = float(masked_roc_auc(jnp.asarray(logits_p), jnp.asarray(labels_p),
                                jnp.asarray(mask)))
    ref = roc_auc_score(labels[:200], logits[:200])
    assert abs(ours - ref) < 1e-5


def test_auc_single_class_returns_zero():
    logits = jnp.asarray(np.random.randn(64).astype(np.float32))
    assert float(masked_roc_auc(logits, jnp.ones(64))) == 0.0
    assert float(masked_roc_auc(logits, jnp.zeros(64))) == 0.0


def test_masked_bce_matches_manual():
    rng = np.random.RandomState(5)
    logits = jnp.asarray(rng.randn(100).astype(np.float32))
    labels = jnp.asarray((rng.rand(100) < 0.5).astype(np.float32))
    mask = jnp.asarray((rng.rand(100) < 0.8).astype(np.float32))
    ours = float(masked_bce(logits, labels, mask))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    l = -(np.asarray(labels) * np.log(p) + (1 - np.asarray(labels)) * np.log1p(-p))
    ref = (l * np.asarray(mask)).sum() / np.asarray(mask).sum()
    assert abs(ours - ref) < 1e-5
