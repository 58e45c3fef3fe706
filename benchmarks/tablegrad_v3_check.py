#!/usr/bin/env python
"""v3 flat densify kernel vs v1(+reshape) on real TPU: numeric parity and
chained-scan marginal timing.

Tunnel discipline: NEVER fetch big arrays — an 84 MB device->host copy
through the axon tunnel takes minutes. Small-table parity fetches ~1 MB;
Criteo-scale parity compares v3 vs v1 ON DEVICE and fetches one scalar.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from armnet_tpu.kernels.scatter_pallas import (_table_grad_tpu,
                                               _table_grad_tpu_v3)

N = 4096 * 39
E = 10
NROWS = 2_100_000
LENS = (1, 11)
REPS = 3


def chain_time(body):
    times = {}
    for n in LENS:
        @jax.jit
        def chain(s):
            out, _ = jax.lax.scan(lambda c, _: (body(c), ()), s, None,
                                  length=n)
            return out
        float(chain(jnp.zeros(())))
        t0 = time.perf_counter()
        for _ in range(REPS):
            float(chain(jnp.zeros(())))
        times[n] = (time.perf_counter() - t0) / REPS
    return (times[LENS[1]] - times[LENS[0]]) / (LENS[1] - LENS[0])


def main():
    rng = np.random.RandomState(0)

    # small-table parity vs host numpy oracle (multiple buckets + ragged)
    ns, nr = 20000, 30011
    idsS = jnp.asarray(rng.randint(0, nr, (ns,)), jnp.int32)
    gS = jnp.asarray(rng.randn(ns, E), jnp.float32)
    want = np.zeros((nr, E), np.float32)
    np.add.at(want, np.asarray(idsS), np.asarray(gS))
    got3 = np.asarray(jax.jit(_table_grad_tpu_v3, static_argnums=2)(
        gS, idsS, nr))
    print("v3 small-table max abs err",
          np.abs(got3 - want.reshape(-1)).max(), flush=True)

    # Criteo-scale parity: v3 vs v1 compared on device, scalar fetch only
    ids0 = jnp.asarray(rng.randint(0, NROWS, (N,)), jnp.int32)
    g0 = jnp.asarray(rng.randn(N, E), jnp.float32)

    @jax.jit
    def devcmp(g, ids):
        a = _table_grad_tpu_v3(g, ids, NROWS)
        b = _table_grad_tpu(g, ids, NROWS).reshape(-1)
        return jnp.max(jnp.abs(a - b)), jnp.sum(a), jnp.sum(b)
    d, sa, sb = devcmp(g0, ids0)
    print(f"criteo-scale v3-vs-v1 max abs {float(d):.3e} "
          f"sums {float(sa):.3f}/{float(sb):.3f}", flush=True)

    def dyn(s):
        return ids0 + (s * 0).astype(jnp.int32), g0 + s * 0

    def v1_body(s):
        ids, g = dyn(s)
        out = _table_grad_tpu(g, ids, NROWS).reshape(-1)
        return s * 0 + out[0] + out[-1]

    def v3_body(s):
        ids, g = dyn(s)
        out = _table_grad_tpu_v3(g, ids, NROWS)
        return s * 0 + out[0] + out[-1]

    for name, body in (("v3", v3_body), ("v1+reshape", v1_body)):
        ms = chain_time(body) * 1e3
        print(f"{name:12s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
