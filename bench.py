#!/usr/bin/env python
"""Benchmark: armnet_1h full training-step throughput (fwd + BCE + bwd +
clip/Adam + on-device AUC) at the canonical Frappe recipe
(nfeat=5500, F=10, E=10, h=128, MLP 2x256, batch 4096 — run.sh armnet_1h).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline anchor: the reference publishes no throughput numbers
(BASELINE.md) — the anchor is the reference PyTorch implementation's
train-step throughput measured on this host's CPU (1,559 examples/s,
batch 4096, same recipe, torch 2.x single core). Values > 1 mean faster
than the reference implementation runs on this machine.
"""

import json
import os
import time

# Reference (torch CPU, this host) examples/s — see module docstring.
REFERENCE_BASELINE_EXS = 1559.0

BATCH = 4096
WARMUP_STEPS = 5
MEASURE_STEPS = 50


def main():
    repo = os.path.dirname(os.path.abspath(__file__))
    cache_dir = os.path.join(repo, ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)

    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from armnet_tpu.models import ModelConfig, create_model
    from armnet_tpu.train.step import (create_train_state, init_meters,
                                       make_train_step)

    cfg = ModelConfig(model="armnet_1h", nfeat=5500, nfield=10, nemb=10,
                      h=128, mlp_nlayer=2, mlp_nhid=256, alpha=1.7)
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
    step = make_train_step()
    key = jax.random.key(0)

    meters = init_meters()
    for _ in range(WARMUP_STEPS):
        state, meters = step(state, meters, batch, key)
    jax.block_until_ready(meters)

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, meters = step(state, meters, batch, key)
    jax.block_until_ready(meters)
    dt = time.perf_counter() - t0

    exs = MEASURE_STEPS * BATCH / dt
    print(json.dumps({
        "metric": "armnet_1h_train_examples_per_sec",
        "value": round(exs, 1),
        "unit": "examples/s",
        "vs_baseline": round(exs / REFERENCE_BASELINE_EXS, 2),
    }))


if __name__ == "__main__":
    main()
