#!/usr/bin/env python
"""Micro-decomposition of the table-gradient path's HOST-GRAPH (plain XLA)
pieces at the Criteo recipe shape (N=4096*39 updates, [2.1M, 10] table):

  argsort       jnp.argsort(ids)                      (v1-v4 prep)
  sort_comb     jnp.sort of ONE combined key (bucket<<18 | pos) — candidate
                replacement: grouping by bucket is all the kernel needs,
                and a single-operand sort beats the key+payload co-sort
  searchsorted  per-bucket start offsets (1027 queries into the sorted ids)
  pair_build    bf16 hi|residual payload build (reduce_precision + concat)
  pair_gather   + gather pair[order]
  pair_gatherT  + transpose to [2e, N] (the v4 payload layout)
  idrow         sid broadcast to [8, N]
  kernel_v4     table_grad (v4) end-to-end MINUS nothing — the full call
  reshape_tax   marginal of .reshape(-1) on the kernel's [nrows, e] output
                (the padded->flat relayout the optimizer layout forces)
  transposeT    [e, nrows] -> flat [nrows*e] via .T.reshape(-1) (what a
                transposed-output kernel would pay instead)

Chained-scan marginal timing (see bench.py docstring for why).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_repo, ".cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax
import numpy as np

from armnet_tpu.kernels.scatter_pallas import table_grad

N = 4096 * 39
E = 10
NROWS = 2_100_000
BUCKET = 2048
LENS = (1, 11)
REPS = 3
IDX_BITS = 18
assert N < (1 << IDX_BITS)


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
    nb = -(-NROWS // BUCKET)

    def dyn(s):
        # REAL data dependency on the carried scalar: a `+ s*0` fake folds to
        # a constant and XLA hoists the whole id-dependent graph (sort,
        # searchsorted, broadcasts) out of the scan as loop-invariant —
        # measuring 0 ms. Roll by a dynamic shift + a tiny real add instead.
        si = jnp.abs(s.astype(jnp.int32)) % 7
        return jnp.roll(ids0, si), g0 + s * 1e-20

    def probe(s, x):
        # barrier forces the stage output to actually materialize (a bare
        # read would let XLA fuse the producer into the read and compute
        # one element); the tiny slice-sum afterwards is the cheap liveness
        # anchor the fetched scalar depends on
        x = jax.lax.optimization_barrier(x)
        head = jax.lax.slice(x.reshape(-1), (0,), (256,))
        return s * 1e-30 + jnp.sum(head.astype(jnp.float32))

    def dyn_overhead_body(s):
        ids, g = dyn(s)
        return probe(s, ids) + probe(s, g)

    def argsort_body(s):
        ids, g = dyn(s)
        return probe(s, jnp.argsort(ids))

    def sort_comb_body(s):
        ids, g = dyn(s)
        comb = ((ids >> 11) << IDX_BITS) | jnp.arange(N, dtype=jnp.int32)
        return probe(s, jnp.sort(comb))

    def sort_comb_full_body(s):
        # comb sort + order extraction + sid gather + starts: the complete
        # v5-prep candidate (minus the payload, measured separately)
        ids, g = dyn(s)
        comb = ((ids >> 11) << IDX_BITS) | jnp.arange(N, dtype=jnp.int32)
        cs = jnp.sort(comb)
        order = cs & ((1 << IDX_BITS) - 1)
        sid = ids[order]
        edges = (jnp.arange(nb + 1, dtype=jnp.int32) << IDX_BITS)
        starts = jnp.searchsorted(cs, edges).astype(jnp.int32)
        return probe(s, sid) + probe(s, starts)

    def searchsorted_body(s):
        ids, g = dyn(s)
        sid = lax.sort(ids)
        edges = (jnp.arange(nb + 1, dtype=jnp.int32) * BUCKET)
        starts = jnp.searchsorted(sid, edges).astype(jnp.int32)
        return probe(s, sid) + probe(s, starts)

    def sort_only_body(s):
        ids, g = dyn(s)
        return probe(s, lax.sort(ids))

    def pair_build_body(s):
        ids, g = dyn(s)
        hi = lax.reduce_precision(g, 8, 7)
        pair = jnp.concatenate([hi.astype(jnp.bfloat16),
                                (g - hi).astype(jnp.bfloat16)], axis=1)
        return probe(s, pair.astype(jnp.float32))

    def pair_gather_body(s):
        ids, g = dyn(s)
        order = jnp.argsort(ids)
        hi = lax.reduce_precision(g, 8, 7)
        pair = jnp.concatenate([hi.astype(jnp.bfloat16),
                                (g - hi).astype(jnp.bfloat16)], axis=1)
        return probe(s, pair[order].astype(jnp.float32))

    def pair_gatherT_body(s):
        ids, g = dyn(s)
        order = jnp.argsort(ids)
        hi = lax.reduce_precision(g, 8, 7)
        pair = jnp.concatenate([hi.astype(jnp.bfloat16),
                                (g - hi).astype(jnp.bfloat16)], axis=1)
        return probe(s, pair[order].T.astype(jnp.float32))

    def idrow_body(s):
        ids, g = dyn(s)
        order = jnp.argsort(ids)
        sid = ids[order]
        return probe(s, jnp.broadcast_to(sid[None, :], (8, N)))

    def kernel_v4_body(s):
        ids, g = dyn(s)
        out = table_grad(g, ids, NROWS)
        return probe(s, out)

    def kernel_flat_body(s):
        # the production path (flat-stored tables): honors ARMNET_SCATTER,
        # so ARMNET_SCATTER=v5 measures the transposed-output kernel plus
        # its .T.reshape(-1) against v4 plus its .reshape(-1)
        from armnet_tpu.kernels.scatter_pallas import table_grad_flat
        ids, g = dyn(s)
        out = jax.lax.optimization_barrier(table_grad_flat(g, ids, NROWS))
        return probe(s, out)

    def reshape_tax_body(s):
        ids, g = dyn(s)
        out = table_grad(g, ids, NROWS)
        flat = jax.lax.optimization_barrier(out.reshape(-1))
        return probe(s, flat)

    def transposeT_body(s):
        # stand-in for a transposed-output kernel's post-processing:
        # [e, nrows] -> row-major flat.  (input produced by a cheap op)
        ids, g = dyn(s)
        t = jnp.broadcast_to(g[:E, 0:1], (E, NROWS)) + s * 1e-20
        t = jax.lax.optimization_barrier(t)
        flat = jax.lax.optimization_barrier(t.T.reshape(-1))
        return probe(s, flat)

    def idcol_body(s):
        # [N, 128] int32 broadcast (the sublane-oriented id column a
        # transposed-onehot kernel would DMA)
        ids, g = dyn(s)
        order = jnp.argsort(ids)
        sid = ids[order]
        return probe(s, jnp.broadcast_to(sid[:, None], (N, 128)))

    stages = (
        ("dyn_overhead", dyn_overhead_body),
        ("sort_only", sort_only_body),
        ("argsort", argsort_body),
        ("sort_comb", sort_comb_body),
        ("sort_comb_full", sort_comb_full_body),
        ("searchsorted", searchsorted_body),
        ("pair_build", pair_build_body),
        ("pair_gather", pair_gather_body),
        ("pair_gatherT", pair_gatherT_body),
        ("idrow", idrow_body),
        ("idcol", idcol_body),
        ("kernel_v4", kernel_v4_body),
        ("kernel_flat", kernel_flat_body),
        ("reshape_tax", reshape_tax_body),
        ("transposeT", transposeT_body),
    )
    only = None
    if len(sys.argv) > 1:
        only = set(sys.argv[1].split(","))
    for name, body in stages:
        if only and name not in only:
            continue
        ms = chain_time(body) * 1e3
        print(f"{name:16s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
