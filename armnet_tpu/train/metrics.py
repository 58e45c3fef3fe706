"""On-device metrics.

The reference copies logits to host and calls sklearn per batch
(train.py:120, utils.py:85-106) — a device->host sync every step. Here ROC-AUC
is computed on-device with a tie-aware rank (Mann-Whitney) formulation; only
one scalar crosses to the host per batch. Parity: matches
sklearn.roc_auc_score (average-rank tie handling) and returns 0.0 for
single-class batches like the reference's exception path (utils.py:102-106).
"""

import jax
import jax.numpy as jnp
import optax

__all__ = ["masked_roc_auc", "masked_bce", "masked_accuracy",
           "masked_softmax_ce"]


def masked_roc_auc(logits, labels, mask=None):
    """Tie-aware ROC-AUC over entries with mask > 0 (jit-friendly, O(n log n)).

    Padded entries are pushed to -inf so they occupy the lowest ranks; the
    rank-sum is then corrected by the pad count. Single-class -> 0.0.
    """
    logits = logits.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(logits)
    n = logits.shape[0]
    valid = mask > 0
    npad = n - jnp.sum(valid)

    x = jnp.where(valid, logits, -jnp.inf)
    sorted_x = jnp.sort(x)
    left = jnp.searchsorted(sorted_x, x, side="left")
    right = jnp.searchsorted(sorted_x, x, side="right")
    avg_rank = (left + right + 1).astype(jnp.float32) / 2.0   # 1-based

    pos = valid & (labels > 0.5)
    neg = valid & (labels <= 0.5)
    npos = jnp.sum(pos).astype(jnp.float32)
    nneg = jnp.sum(neg).astype(jnp.float32)

    rank_sum = jnp.sum(jnp.where(pos, avg_rank, 0.0))
    # subtract the pad offset (all pads rank below every valid entry)
    u = rank_sum - npad.astype(jnp.float32) * npos - npos * (npos + 1.0) / 2.0
    auc = u / jnp.maximum(npos * nneg, 1.0)
    return jnp.where((npos > 0) & (nneg > 0), auc, 0.0)


def masked_bce(logits, labels, mask):
    """Mean sigmoid-BCE over valid rows (BCEWithLogitsLoss parity).

    where, not `losses * mask`: pad rows are outside every distributional
    guarantee (masked BN statistics exclude them, r5), so a pad logit can
    be arbitrarily large or non-finite — and inf * 0 = NaN would poison
    the batch loss. where zeroes the pad lane before the sum."""
    logits = logits.astype(jnp.float32)
    losses = optax.sigmoid_binary_cross_entropy(logits, labels)
    losses = jnp.where(mask > 0, losses, 0.0)
    return jnp.sum(losses) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_softmax_ce(logits, labels, mask):
    """Mean softmax cross-entropy over valid rows; logits [B, C], labels [B]
    class indices (float-carried in the batch schema, cast here). The UCI
    multi-class loss (reference uci branch trains CrossEntropyLoss).
    where-guarded like masked_bce (pad logits may be non-finite)."""
    labels = labels.astype(jnp.int32)
    losses = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels)
    losses = jnp.where(mask > 0, losses, 0.0)
    return jnp.sum(losses) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_accuracy(logits, labels, mask, topk=1):
    """Top-k accuracy over valid rows (reference utils.py:68-82 `accuracy`,
    reported as a fraction in [0, 1] rather than percent)."""
    labels = labels.astype(jnp.int32)
    if topk == 1:
        hit = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    else:
        _, pred = jax.lax.top_k(logits, topk)            # [B, k]
        hit = jnp.any(pred == labels[:, None], axis=-1).astype(jnp.float32)
    return jnp.sum(hit * mask) / jnp.maximum(jnp.sum(mask), 1.0)
