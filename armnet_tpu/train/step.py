"""Jitted train/eval steps.

Optimizer parity with the reference (train.py:60-66): BCE-with-logits loss,
elementwise gradient clamp to [-1, 1] *before* Adam (the reference registers
per-parameter clamp hooks — here it's `optax.clip(1.0)` at the head of the
chain), Adam with torch defaults (b1=0.9, b2=0.999, eps=1e-8).

BatchNorm batch_stats are threaded through a TrainState extension; dropout
keys are derived per-step by folding the step counter into a base key.
"""

from typing import Any

import jax
import optax
from flax.training import train_state

from armnet_tpu.ops.layers import batch_mask_scope
from armnet_tpu.train.metrics import (masked_accuracy, masked_bce,
                                      masked_roc_auc, masked_softmax_ce)


def task_fns(task):
    """(loss_fn, metric_fn, metric_name) for a task: 'binary' is the CTR path
    (BCE + ROC-AUC, reference train.py:60,120); 'multiclass' is the UCI path
    (softmax CE + top-1 accuracy, reference utils.py:68-82)."""
    if task == "binary":
        return masked_bce, masked_roc_auc, "AUC"
    if task == "multiclass":
        return masked_softmax_ce, masked_accuracy, "Acc"
    raise ValueError(f"unknown task {task!r}")

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_eval_step", "make_optimizer", "init_meters", "task_fns"]


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def make_optimizer(lr, clip=1.0):
    """clip-then-Adam, matching the reference's per-parameter grad clamp."""
    return optax.chain(optax.clip(clip), optax.adam(lr))


def create_train_state(model, batch, lr, seed=0, clip=1.0):
    """Initialize params/batch_stats and build the optimizer state."""
    variables = model.init(
        {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
        {"id": batch["id"], "value": batch["value"]}, train=False)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=make_optimizer(lr, clip),
        batch_stats=variables.get("batch_stats", {}),
    )


def init_meters():
    """Device-resident metric accumulators. The reference syncs to the host
    every batch (sklearn AUC, loss.item()); we accumulate on device and fetch
    only at report/epoch boundaries — critical when the chip sits behind a
    high-latency tunnel."""
    import jax.numpy as jnp

    z = jnp.zeros((), jnp.float32)
    return {"loss_sum": z, "auc_sum": z, "weight": z,
            "loss_last": z, "auc_last": z, "overflow_sum": z}


def _update_meters(meters, loss, auc, n, overflow=None):
    new = {"loss_sum": meters["loss_sum"] + loss * n,
           "auc_sum": meters["auc_sum"] + auc * n,
           "weight": meters["weight"] + n,
           "loss_last": loss, "auc_last": auc,
           "overflow_sum": meters["overflow_sum"]}
    if overflow is not None:
        new["overflow_sum"] = meters["overflow_sum"] + overflow
    return new


def make_train_step(donate=False, shardings=None, lookup_cm=None,
                    task="binary", overflow_fn=None, param_transform=None):
    """Build the jitted training step: fwd -> BCE -> bwd -> clip -> Adam,
    plus on-device AUC on the pre-update logits (reference run() parity).
    Metrics fold into device-side meters; nothing blocks the dispatch queue.

    shardings: optional (state_sh, meters_sh, batch_sh) NamedSharding trees —
    when given, the step is pjit-compiled over the mesh (DP gradients psum'd
    by XLA; row-sharded tables handled by the lookup context).
    lookup_cm: optional zero-arg contextmanager entered around every call so
    the sharded-embedding dispatch is active at trace time.
    overflow_fn: optional (ids, mask) -> scalar counting a2a capacity-overflow drops of REAL rows
    this batch (folded into the overflow meter; see embedding_parallel).
    param_transform: optional params -> params mutation applied to the STORED
    weights at the head of every step — the functional twin of reference
    models that mutate .data outside autograd each forward (AFN's
    positivity clamp, models/afn.py); gradients and Adam then act on the
    mutated values with identity geometry, exactly like torch."""
    loss_metric, quality_metric, _ = task_fns(task)

    def train_step(state, meters, batch, rng):
        if param_transform is not None:
            state = state.replace(params=param_transform(state.params))
        dropout_key = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            # batch_mask_scope: BatchNorm computes MASKED batch statistics so
            # the padded final batch matches the reference's genuinely-small
            # last batch (see ops/layers.py batch_mask_scope)
            with batch_mask_scope(batch["mask"]):
                logits, updates = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    {"id": batch["id"], "value": batch["value"]},
                    train=True, rngs={"dropout": dropout_key},
                    mutable=["batch_stats"])
            loss = loss_metric(logits, batch["y"], batch["mask"])
            return loss, (logits, updates)

        (loss, (logits, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(
            grads=grads, batch_stats=updates["batch_stats"])
        auc = quality_metric(logits, batch["y"], batch["mask"])
        overflow = (overflow_fn(batch["id"], batch["mask"])
                    if overflow_fn else None)
        meters = _update_meters(meters, loss, auc, batch["mask"].sum(),
                                overflow)
        return state, meters

    # donation is off by default: the axon-tunneled TPU backend rejects
    # donated buffers on this program (INVALID_ARGUMENT at the next sync);
    # model sizes here leave ample HBM headroom without it.
    kw = {}
    if shardings is not None:
        state_sh, meters_sh, batch_sh = shardings
        kw = dict(in_shardings=(state_sh, meters_sh, batch_sh, None),
                  out_shardings=(state_sh, meters_sh))
    jitted = jax.jit(train_step, donate_argnums=(0, 1) if donate else (), **kw)
    return _with_lookup_cm(jitted, lookup_cm)


def _with_lookup_cm(jitted, lookup_cm):
    if lookup_cm is None:
        return jitted

    def wrapped(*args):
        with lookup_cm():
            return jitted(*args)

    return wrapped


def make_eval_step(shardings=None, lookup_cm=None, task="binary",
                   overflow_fn=None, param_transform=None):
    """Jitted eval step: frozen batch_stats, no dropout."""
    loss_metric, quality_metric, _ = task_fns(task)

    def eval_step(state, meters, batch):
        params = (param_transform(state.params)
                  if param_transform is not None else state.params)
        logits = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            {"id": batch["id"], "value": batch["value"]}, train=False)
        loss = loss_metric(logits, batch["y"], batch["mask"])
        auc = quality_metric(logits, batch["y"], batch["mask"])
        overflow = (overflow_fn(batch["id"], batch["mask"])
                    if overflow_fn else None)
        return _update_meters(meters, loss, auc, batch["mask"].sum(),
                              overflow)

    kw = {}
    if shardings is not None:
        state_sh, meters_sh, batch_sh = shardings
        kw = dict(in_shardings=(state_sh, meters_sh, batch_sh),
                  out_shardings=meters_sh)
    return _with_lookup_cm(jax.jit(eval_step, **kw), lookup_cm)
