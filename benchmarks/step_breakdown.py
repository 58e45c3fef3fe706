#!/usr/bin/env python
"""Where does the train-step time go? Chained-scan marginal timing of
nested subsets of the armnet_1h Criteo-recipe step:

  fwd        forward only (eval mode, no BN update, no metrics)
  fwd_bwd    + BCE loss + backward (includes the table-gradient densify)
  no_metrics + clip/Adam update (full step minus AUC/meters)
  full       + on-device AUC + meters  (== bench.py headline)

Same methodology as bench.py: steps chained inside one jitted lax.scan
(data dependency serializes), marginal cost between chain lengths 1 and 11,
host fetch as the barrier.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from armnet_tpu.models import ModelConfig, create_model
from armnet_tpu.train.metrics import masked_bce, masked_roc_auc
from armnet_tpu.train.step import create_train_state

BATCH = 4096
LENS = (1, 11)
REPS = 3

# Criteo-geometry recipes (reference run.sh:17-19); gc_arm shares armnet's.
CONFIGS = {
    "armnet_1h": dict(model="armnet_1h", nfeat=2_100_000, nfield=39, nemb=10,
                      h=128, mlp_nlayer=2, mlp_nhid=500, alpha=2.0),
    "armnet": dict(model="armnet", nfeat=2_100_000, nfield=39, nemb=10,
                   h=64, nattn_head=4, mlp_nlayer=2, mlp_nhid=500, alpha=2.0),
    "gc_arm": dict(model="gc_arm", nfeat=2_100_000, nfield=39, nemb=10,
                   h=64, nattn_head=4, mlp_nlayer=2, mlp_nhid=500, alpha=2.0),
}


def chain_time(make_body, carry0, get=lambda c: c[0]):
    """Marginal per-step seconds via chained lax.scan. `get` must select a
    carry element every iteration's compute feeds into (the fetched scalar is
    the only live output — anything it doesn't depend on is dead code)."""
    times = {}
    for n in LENS:
        @jax.jit
        def chain(carry):
            out, _ = jax.lax.scan(make_body(), carry, None, length=n)
            return get(out)
        float(chain(carry0))
        t0 = time.perf_counter()
        for _ in range(REPS):
            float(chain(carry0))
        times[n] = (time.perf_counter() - t0) / REPS
    return (times[LENS[1]] - times[LENS[0]]) / (LENS[1] - LENS[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="armnet_1h", choices=sorted(CONFIGS))
    args = p.parse_args()
    cfg = ModelConfig(**CONFIGS[args.model])
    model = create_model(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "id": jnp.asarray(rng.randint(0, cfg.nfeat, (BATCH, cfg.nfield)),
                          jnp.int32),
        "value": jnp.ones((BATCH, cfg.nfield), jnp.float32),
        "y": jnp.asarray(rng.randint(0, 2, (BATCH,)).astype(np.float32)),
        "mask": jnp.ones((BATCH,), jnp.float32),
    }
    state = create_train_state(model, batch, lr=1e-3, seed=0)
    key = jax.random.key(0)

    def feed(batch, scalar):
        # data-dependency hook: fold a result scalar back into the input.
        # The ids must REALLY vary per step — `+ scalar*0` folds to a
        # constant and XLA hoists the whole id-dependent prep (sort etc.)
        # out of the scan (r3 protocol fix; see bench.py)
        b = dict(batch)
        si = jnp.abs(scalar).astype(jnp.int32) % 97
        b["id"] = (batch["id"] + si) % cfg.nfeat
        b["value"] = batch["value"] + scalar * 1e-30
        return b

    def fwd_body():
        def body(carry, _):
            s, = carry
            b = feed(batch, s)
            logits = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                {"id": b["id"], "value": b["value"]}, train=False)
            return (logits.sum(),), ()
        return body

    def fwd_bwd_body():
        def body(carry, _):
            s, = carry
            b = feed(batch, s)

            def loss_fn(params):
                logits, _ = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    {"id": b["id"], "value": b["value"]}, train=True,
                    rngs={"dropout": key}, mutable=["batch_stats"])
                return masked_bce(logits, b["y"], b["mask"])

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            gs = sum(g.ravel()[0] for g in jax.tree.leaves(grads))
            return (loss + gs,), ()
        return body

    def fwd_bwd_dense_body():
        # backward for every param EXCEPT the embedding tables: isolates the
        # table-gradient densify + scatter path (the difference vs fwd_bwd)
        emb_keys = [k for k in state.params if "embedding" in k.lower()]

        def body(carry, _):
            s, = carry
            b = feed(batch, s)

            def loss_fn(rest):
                params = dict(rest)
                for k in emb_keys:
                    params[k] = jax.lax.stop_gradient(state.params[k])
                logits, _ = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    {"id": b["id"], "value": b["value"]}, train=True,
                    rngs={"dropout": key}, mutable=["batch_stats"])
                return masked_bce(logits, b["y"], b["mask"])

            rest = {k: v for k, v in state.params.items()
                    if k not in emb_keys}
            loss, grads = jax.value_and_grad(loss_fn)(rest)
            gs = sum(g.ravel()[0] for g in jax.tree.leaves(grads))
            return (loss + gs,), ()
        return body

    def step_body(with_auc):
        def body(carry, _):
            st, acc = carry
            b = feed(batch, acc)

            def loss_fn(params):
                logits, updates = model.apply(
                    {"params": params, "batch_stats": st.batch_stats},
                    {"id": b["id"], "value": b["value"]}, train=True,
                    rngs={"dropout": key}, mutable=["batch_stats"])
                return masked_bce(logits, b["y"], b["mask"]), (logits, updates)

            (loss, (logits, upd)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params)
            st = st.apply_gradients(grads=grads,
                                    batch_stats=upd["batch_stats"])
            acc = loss
            if with_auc:
                acc = acc + masked_roc_auc(logits, b["y"], b["mask"])
            return (st, acc), ()
        return body

    z = jnp.zeros(())
    results = {}
    results["fwd"] = chain_time(fwd_body, (z,))
    results["fwd_bwd_dense"] = chain_time(fwd_bwd_dense_body, (z,))
    results["fwd_bwd"] = chain_time(fwd_bwd_body, (z,))
    results["no_metrics"] = chain_time(lambda: step_body(False), (state, z),
                                       get=lambda c: c[1])
    results["full"] = chain_time(lambda: step_body(True), (state, z),
                                 get=lambda c: c[1])

    prev = 0.0
    for k in ("fwd", "fwd_bwd_dense", "fwd_bwd", "no_metrics", "full"):
        ms = results[k] * 1e3
        print(f"{k:12s} {ms:8.2f} ms  (+{ms - prev:6.2f})")
        prev = ms


if __name__ == "__main__":
    main()
