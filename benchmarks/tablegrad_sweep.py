#!/usr/bin/env python
"""Sweep scatter_pallas BUCKET/CHUNK at the Criteo recipe shape."""

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

    def full_body(s):
        ids = ids0 + (s * 0).astype(jnp.int32)
        g = g0 + s * 0
        out = sp._table_grad_tpu(g, ids, NROWS, flat=True)
        return s * 0 + out[0] + out[-1]

    for bucket in (1024, 2048, 4096):
        for chunk in (128, 256):
            sp.BUCKET, sp.CHUNK, sp.WIN = bucket, chunk, chunk + sp.ALIGN
            ms = chain_time(full_body) * 1e3
            print(f"BUCKET={bucket:5d} CHUNK={chunk:4d}  {ms:7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
