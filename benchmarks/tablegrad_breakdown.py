#!/usr/bin/env python
"""Decompose the embedding-table gradient path (kernels/scatter_pallas.py)
at the Criteo recipe shape: N=4096*39 updates into a [2.1M, 10] table.

  argsort      jnp.argsort of the N int32 ids
  sort_gather  + payload gather g[order] + transposed payload build
  full         table_grad() end-to-end (sort + searchsorted + kernel)

Chained-scan marginal timing (see bench.py docstring for why).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from armnet_tpu.kernels.scatter_pallas import table_grad

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
    ids0 = jnp.asarray(rng.randint(0, NROWS, (N,)), jnp.int32)
    g0 = jnp.asarray(rng.randn(N, E), jnp.float32)

    def dyn(s):
        # make inputs depend on the carried scalar so nothing constant-folds
        return ids0 + (s * 0).astype(jnp.int32), g0 + s * 0

    def argsort_body(s):
        # dynamic index (unknown at trace time) so XLA can't reduce the sort
        # to an argmin/selection of a static position
        ids, g = dyn(s)
        k = (s * 0).astype(jnp.int32) + 12345
        order = jnp.argsort(ids)
        return s * 0 + order[k].astype(jnp.float32)

    def sort_gather_body(s):
        ids, g = dyn(s)
        k = (s * 0).astype(jnp.int32) + 12345
        order = jnp.argsort(ids)
        sid = ids[order]
        sg = g[order]
        payload = jnp.concatenate(
            [sg.T, sid[None, :].astype(jnp.float32),
             jnp.zeros((16 - E - 1, N), jnp.float32)], axis=0)
        return s * 0 + payload[0, k] + payload[E, k]

    def full_body(s):
        ids, g = dyn(s)
        out = table_grad(g, ids, NROWS)
        return s * 0 + out[0, 0] + out[-1, -1]

    for name, body in (("argsort", argsort_body),
                       ("sort_gather", sort_gather_body),
                       ("full", full_body)):
        ms = chain_time(body) * 1e3
        print(f"{name:12s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
