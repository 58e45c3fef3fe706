#!/usr/bin/env python
"""Recipe-surface throughput: full train-step cost for every published ARM
recipe family, not just the alpha=2.0 headline (VERDICT r1: throughput
coverage must match recipe coverage — the published recipes use alpha
1.5/1.7/2.0/2.5, multi-head armnet, and gc_arm; reference run.sh:6-23).

One process, one device acquisition; chained-scan marginal timing
(bench.py methodology); scalar fetches only. Emits one JSON line per
recipe and a closing summary line.

    timeout 590 python -u benchmarks/recipes.py [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 4096
LENS = (1, 11)
REPS = 3

# (tag, model kwargs) — geometry from the reference run.sh recipes:
#   CR_armnet1h run.sh:19, CR_armnet run.sh:17 (h=64, 4 heads),
#   AV_armnet1h run.sh:15 (alpha=1.5), alpha=1.7 is the Frappe/diabetes
#   sweet spot, 2.5 appears in the README alpha sweep; gc_arm uses the
#   armnet geometry (model zoo parity).
RECIPES = [
    ("armnet_1h_criteo_a2.0", dict(model="armnet_1h", nfeat=2_100_000,
                                   nfield=39, nemb=10, h=128, mlp_nlayer=2,
                                   mlp_nhid=500, alpha=2.0)),
    ("armnet_1h_criteo_a1.7", dict(model="armnet_1h", nfeat=2_100_000,
                                   nfield=39, nemb=10, h=128, mlp_nlayer=2,
                                   mlp_nhid=500, alpha=1.7)),
    ("armnet_1h_avazu_a1.5", dict(model="armnet_1h", nfeat=1_600_000,
                                  nfield=22, nemb=10, h=128, mlp_nlayer=3,
                                  mlp_nhid=200, alpha=1.5)),
    ("armnet_mh_criteo_a2.0", dict(model="armnet", nfeat=2_100_000,
                                   nfield=39, nemb=10, h=64, nattn_head=4,
                                   mlp_nlayer=2, mlp_nhid=500, alpha=2.0)),
    ("gc_arm_criteo_a2.0", dict(model="gc_arm", nfeat=2_100_000,
                                nfield=39, nemb=10, h=64, nattn_head=4,
                                mlp_nlayer=2, mlp_nhid=500, alpha=2.0)),
    # baseline-zoo rows: exercise the FeaturesLinear flat-weight path
    # (r4: [nfeat,1] -> flat [nfeat] storage, 128x lane-pad removed from
    # the first-order weight's optimizer passes) at Criteo geometry
    ("lr_criteo", dict(model="lr", nfeat=2_100_000, nfield=39, nemb=10)),
    ("fm_criteo", dict(model="fm", nfeat=2_100_000, nfield=39, nemb=10)),
    ("dfm_criteo", dict(model="dfm", nfeat=2_100_000, nfield=39, nemb=10,
                        mlp_nlayer=2, mlp_nhid=500)),
]


def bench_one(tag, kwargs):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from armnet_tpu.models import ModelConfig, create_model
    from armnet_tpu.train.step import (create_train_state, init_meters,
                                       make_train_step)

    cfg = ModelConfig(**kwargs)
    model = create_model(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "id": jnp.asarray(rng.randint(0, cfg.nfeat, (BATCH, cfg.nfield)),
                          jnp.int32),
        "value": jnp.ones((BATCH, cfg.nfield), jnp.float32),
        "y": jnp.asarray(rng.randint(0, 2, (BATCH,)).astype(np.float32)),
        "mask": jnp.ones((BATCH,), jnp.float32),
    }
    state0 = create_train_state(model, batch, lr=1e-3, seed=0)
    key = jax.random.key(0)
    step = make_train_step()

    def make_chain(n):
        @jax.jit
        def chain(state, meters):
            def body(c, _):
                s, m = c
                # fresh ids per chained step — see bench.py (hoisting fix)
                b = dict(batch)
                b["id"] = (batch["id"] + s.step.astype(jnp.int32)) % cfg.nfeat
                s, m = step(s, m, b, key)
                return (s, m), ()
            (s, m), _ = jax.lax.scan(body, (state, meters), None, length=n)
            return m["loss_last"]
        return chain

    times = {}
    for n in LENS:
        chain = make_chain(n)
        float(chain(state0, init_meters()))
        t0 = time.perf_counter()
        for _ in range(REPS):
            float(chain(state0, init_meters()))
        times[n] = (time.perf_counter() - t0) / REPS
    ms = (times[LENS[1]] - times[LENS[0]]) / (LENS[1] - LENS[0]) * 1e3
    row = {"recipe": tag, "ms_per_step": round(ms, 2),
           "examples_per_sec": round(BATCH / ms * 1e3, 1)}
    print(json.dumps(row), flush=True)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="first two recipes only")
    p.add_argument("--only", type=str, default=None,
                   help="comma-separated recipe tags")
    p.add_argument("--bf16", action="store_true",
                   help="bench with bfloat16 activations (--bf16 CLI parity)")
    args = p.parse_args()
    if args.bf16:
        from armnet_tpu.kernels.config import set_compute_dtype
        set_compute_dtype("bfloat16")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache_dir = os.path.join(repo, ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    print("health", float(jnp.ones((4, 4)).sum()), flush=True)

    todo = RECIPES[:2] if args.quick else RECIPES
    if args.only:
        keep = set(args.only.split(","))
        todo = [(t, k) for t, k in RECIPES if t in keep]
    sfx = "_bf16" if args.bf16 else ""
    rows = [bench_one(t + sfx, k) for t, k in todo]
    print(json.dumps({"metric": "recipe_throughput_table", "bf16": args.bf16,
                      "subset": bool(args.only), "rows": rows}))


if __name__ == "__main__":
    main()
