#!/usr/bin/env python
"""Accuracy of the fastpow entmax solver per (N_FAST, N_POLISH) budget.

CPU-only companion to the r4 campaign's 08c throughput sweep: for each
budget, spawn a subprocess (the budget is a module-level constant read at
import) and report max |p - p_ref| against the reference 50-iteration
bisection (ops/entmax.entmax_bisect, the parity contract with
/root/reference/utils/entmax.py:29-68) over random AND adversarial
(tied / near-kink / large-magnitude) gates at alpha in {1.3, 1.7, 1.9}.

Acceptance is RELATIVE to the production Newton solver measured on the
same cases in the same run: large-magnitude logits condition the tau
solve such that ANY converged solver disagrees with the 50-iter
reference by ~5e-6 in f32 (measured: newton's own worst case), so an
absolute 2e-6 bar would reject the production default itself. A budget
passes if its worst error is within 1.2x of newton's worst.

    python benchmarks/fastpow_accuracy.py            # the sweep table
"""

import json
import os
import subprocess
import sys

BUDGETS = [(8, 2), (10, 3), (12, 4), (14, 5)]
REL = 1.2      # pass bar: worst error within this factor of newton's worst


def measure():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from armnet_tpu.kernels.entmax_common import solve_entmax_axis0
    from armnet_tpu.ops.entmax import entmax_bisect

    rng = np.random.RandomState(0)
    F, N = 39, 4096
    cases = {
        "randn": rng.randn(F, N).astype(np.float32) * 3.0,
        # ties: many equal maxima put the support boundary ON an input kink
        "tied": np.repeat(rng.randn(F // 3 + 1, N).astype(np.float32),
                          3, axis=0)[:F] * 2.0,
        # near-kink: one dominant logit, the rest clustered at the threshold
        "kink": np.concatenate(
            [rng.randn(1, N).astype(np.float32) + 4.0,
             rng.randn(F - 1, N).astype(np.float32) * 1e-3], 0),
        "large": rng.randn(F, N).astype(np.float32) * 30.0,
    }
    worst = 0.0
    rows = []
    for alpha in (1.3, 1.7, 1.9):
        for name, x in cases.items():
            got = np.asarray(solve_entmax_axis0(jnp.asarray(x), alpha))
            # reference solves over the LAST axis
            ref = np.asarray(entmax_bisect(jnp.asarray(x.T), alpha=alpha,
                                           n_iter=50)).T
            err = float(np.abs(got - ref).max())
            worst = max(worst, err)
            rows.append({"alpha": alpha, "case": name, "maxerr": err})
    print(json.dumps({"budget": [int(os.environ["ARMNET_ENTMAX_FAST"]),
                                 int(os.environ["ARMNET_ENTMAX_POLISH"])],
                      "worst": worst, "rows": rows}))


def main():
    if os.environ.get("_FPACC_WORKER"):
        measure()
        return
    def run_one(solver, nf, npol):
        env = dict(os.environ, _FPACC_WORKER="1", JAX_PLATFORMS="cpu",
                   ARMNET_ENTMAX_SOLVER=solver,
                   # pin the production newton budget so a caller's exported
                   # experiment overrides can't silently degrade the baseline
                   # the pass bar is computed from
                   ARMNET_ENTMAX_BISECT="8", ARMNET_ENTMAX_NEWTON="6",
                   ARMNET_ENTMAX_FAST=str(nf), ARMNET_ENTMAX_POLISH=str(npol))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             timeout=900)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"  {solver}({nf},{npol}): FAILED\n"
                  f"{out.stdout}\n{out.stderr[-500:]}")
            return None
        return json.loads(line[-1])

    base = run_one("newton", 0, 0)
    if base is None:
        sys.exit(1)
    bar = base["worst"] * REL
    print(f"newton (8,6) production baseline: worst maxerr "
          f"{base['worst']:.2e} -> pass bar {bar:.2e}")
    results = []
    for nf, npol in BUDGETS:
        d = run_one("fastpow", nf, npol)
        if d is None:
            continue
        ok = d["worst"] <= bar
        results.append((nf, npol, d["worst"], ok))
        print(f"  fastpow({nf:2d},{npol}): worst maxerr {d['worst']:.2e} "
              f"{'OK' if ok else 'WORSE THAN NEWTON'}")
    passing = [r for r in results if r[3]]
    if passing:
        nf, npol, err, _ = passing[0]
        print(f"smallest newton-equivalent budget: ({nf},{npol}) "
              f"at {err:.2e}")


if __name__ == "__main__":
    main()
