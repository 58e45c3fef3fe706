#!/usr/bin/env python
"""v2 grouped densify on real TPU: parity vs the jnp scatter-add reference,
then chained-scan marginal timing at the Criteo recipe shape."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import armnet_tpu.kernels.scatter_pallas as sp

N = 4096 * 39
E = 10
NROWS = 2_100_000
LENS = (1, 11)
REPS = 3


def main():
    rng = np.random.RandomState(0)
    ids0 = jnp.asarray(rng.randint(0, NROWS, (N,)), jnp.int32)
    g0 = jnp.asarray(rng.randn(N, E), jnp.float32)

    got = np.asarray(jax.jit(sp._table_grad_tpu_v2,
                             static_argnums=(2,))(g0, ids0, NROWS))
    want = np.asarray(
        sp.table_grad_reference(g0, ids0, NROWS)).reshape(-1)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-30)
    print(f"parity: max rel err {err:.2e}", flush=True)
    assert err < 1e-4, err

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

    def v2_body(s):
        ids = ids0 + (s * 0).astype(jnp.int32)
        g = g0 + s * 0
        out = sp._table_grad_tpu_v2(g, ids, NROWS)
        return s * 0 + out[0] + out[-1]

    print(f"v2 full path  {chain_time(v2_body) * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
