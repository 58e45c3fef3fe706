#!/usr/bin/env python
"""Where does the multi-head ARM interaction time go? The armnet/gc_arm
Criteo recipes run at ~half the 1h flagship's throughput (VERDICT r2 weak
#2); this isolates the [B,K,O,F] = [4096,4,64,39] pipeline stage by stage,
fwd and fwd+bwd, with the chained-scan protocol:

  gates        einsum('bfx,kxy,koy->bkof') * scale
  entmax       Pallas entmax on a [B,K,O,F] input (includes its .T wrappers)
  entmax_jnp   the jnp static-alpha twin (XLA while-loop) for comparison
  wcross       sparse*values -> exp(einsum('bfe,bkof->bkoe'))
  interaction  the full chain gates->entmax->values->exp-cross
  transposes   x.T relayout cost for the [B*K*O, F] entmax input alone

Each stage also has a *_bwd variant: jax.grad of a scalar readout wrt the
stage inputs (captures the VJP's materializations).
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
import numpy as np

B, K, O, F, E = 4096, 4, 64, 39, 10
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
    emb0 = jnp.asarray(rng.randn(B, F, E) * 0.3, jnp.float32)
    bw0 = jnp.asarray(rng.randn(K, E, E) * 0.3, jnp.float32)
    q0 = jnp.asarray(rng.randn(K, O, E) * 0.3, jnp.float32)
    v0 = jnp.asarray(rng.randn(K, O, F) * 0.3, jnp.float32)
    gates0 = jnp.asarray(rng.randn(B, K, O, F), jnp.float32)

    from armnet_tpu.kernels.entmax_pallas import entmax_pallas
    from armnet_tpu.ops.entmax import _entmax_core_static

    def probe(s, x):
        # barrier forces materialization; tiny slice-sum anchors liveness
        x = jax.lax.optimization_barrier(x)
        head = jax.lax.slice(x.reshape(-1), (0,), (256,))
        return s * 1e-30 + jnp.sum(head.astype(jnp.float32))

    def dyn(s, x):
        # real dependency (s*0 folds -> loop-invariant hoisting, see bench.py)
        return x + s * 1e-20

    def gates_fwd(s):
        emb = dyn(s, emb0)
        g = jnp.einsum("bfx,kxy,koy->bkof", emb, bw0, q0) * (E ** -0.5)
        return probe(s, g)

    def gates_bwd(s):
        emb = dyn(s, emb0)

        def f(emb, bw, q):
            g = jnp.einsum("bfx,kxy,koy->bkof", emb, bw, q) * (E ** -0.5)
            return jnp.sum(g * gates0)
        gr = jax.grad(f, argnums=(0, 1, 2))(emb, bw0, q0)
        return probe(s, gr[0]) + probe(s, gr[1])

    def entmax_fwd(s):
        g = dyn(s, gates0)
        return probe(s, entmax_pallas(g, 2.0))

    def entmax_bwd(s):
        g = dyn(s, gates0)
        gr = jax.grad(lambda x: jnp.sum(entmax_pallas(x, 2.0) * gates0))(g)
        return probe(s, gr)

    def entmax_jnp_fwd(s):
        g = dyn(s, gates0)
        return probe(s, _entmax_core_static(g, 2.0, 30))

    def wcross_fwd(s):
        emb, sp = dyn(s, emb0), dyn(s, gates0)
        w = sp * v0[None]
        out = jnp.exp(jnp.einsum("bfe,bkof->bkoe", emb, w))
        return probe(s, out)

    def wcross_bwd(s):
        emb, sp = dyn(s, emb0), dyn(s, gates0)

        def f(emb, sp, v):
            w = sp * v[None]
            return jnp.sum(jnp.exp(jnp.einsum("bfe,bkof->bkoe", emb, w)))
        gr = jax.grad(f, argnums=(0, 1))(emb, sp, v0)
        return probe(s, gr[0]) + probe(s, gr[1])

    def interaction_fwd(s):
        emb = dyn(s, emb0)
        g = jnp.einsum("bfx,kxy,koy->bkof", emb, bw0, q0) * (E ** -0.5)
        sp = entmax_pallas(g, 2.0)
        out = jnp.exp(jnp.einsum("bfe,bkof->bkoe", emb, sp * v0[None]))
        return probe(s, out)

    def interaction_bwd(s):
        emb = dyn(s, emb0)

        def f(emb, bw, q, v):
            g = jnp.einsum("bfx,kxy,koy->bkof", emb, bw, q) * (E ** -0.5)
            sp = entmax_pallas(g, 2.0)
            return jnp.sum(jnp.exp(jnp.einsum("bfe,bkof->bkoe", emb,
                                              sp * v[None])))
        gr = jax.grad(f, argnums=(0, 1, 2, 3))(emb, bw0, q0, v0)
        return probe(s, gr[0]) + probe(s, gr[3])

    def gates_fac_fwd(s):
        # factored: m[k,o,x] = W[k] @ q[k,o]  (tiny), then ONE GEMM
        # [B*F,E]@[E,K*O] — algebraically identical to gates_fwd
        emb = dyn(s, emb0)
        m = jnp.einsum("kxy,koy->kox", bw0, q0)
        g = jnp.einsum("bfx,kox->bkof", emb, m) * (E ** -0.5)
        return probe(s, g)

    def gates_fac_bwd(s):
        emb = dyn(s, emb0)

        def f(emb, bw, q):
            m = jnp.einsum("kxy,koy->kox", bw, q)
            g = jnp.einsum("bfx,kox->bkof", emb, m) * (E ** -0.5)
            return jnp.sum(g * gates0)
        gr = jax.grad(f, argnums=(0, 1, 2))(emb, bw0, q0)
        return probe(s, gr[0]) + probe(s, gr[1])

    def gates_fac_bfo_fwd(s):
        # factored + [B,F,KO] output layout (no minor-dim transpose after
        # the GEMM); consumer would entmax over axis=1
        emb = dyn(s, emb0)
        m = jnp.einsum("kxy,koy->kox", bw0, q0).reshape(K * O, E)
        g = jnp.einsum("bfx,ox->bfo", emb, m) * (E ** -0.5)
        return probe(s, g)

    def interaction_fm_fwd(s):
        # the r3 production pipeline: fields-major [B,F,K*O] end to end
        from armnet_tpu.ops.interaction import (arm_attention_multihead,
                                                arm_exp_cross_fmajor)
        emb = dyn(s, emb0)
        w = arm_attention_multihead(emb, bw0, q0, v0,
                                    lambda g: entmax_pallas(g, 2.0, axis=1))
        return probe(s, arm_exp_cross_fmajor(emb, w))

    def interaction_fm_bwd(s):
        from armnet_tpu.ops.interaction import (arm_attention_multihead,
                                                arm_exp_cross_fmajor)
        emb = dyn(s, emb0)

        def f(emb, bw, q, v):
            w = arm_attention_multihead(emb, bw, q, v,
                                        lambda g: entmax_pallas(g, 2.0,
                                                                axis=1))
            return jnp.sum(arm_exp_cross_fmajor(emb, w))
        gr = jax.grad(f, argnums=(0, 1, 2, 3))(emb, bw0, q0, v0)
        return probe(s, gr[0]) + probe(s, gr[3])

    def transpose_fwd(s):
        g = dyn(s, gates0).reshape(-1, F)
        t = jax.lax.optimization_barrier(g.T)
        return probe(s, t)

    stages = (
        ("gates_fwd", gates_fwd),
        ("gates_bwd", gates_bwd),
        ("entmax_fwd", entmax_fwd),
        ("entmax_bwd", entmax_bwd),
        ("entmax_jnp_fwd", entmax_jnp_fwd),
        ("wcross_fwd", wcross_fwd),
        ("wcross_bwd", wcross_bwd),
        ("interaction_fwd", interaction_fwd),
        ("interaction_bwd", interaction_bwd),
        ("gates_fac_fwd", gates_fac_fwd),
        ("gates_fac_bwd", gates_fac_bwd),
        ("gates_fac_bfo_fwd", gates_fac_bfo_fwd),
        ("interaction_fm_fwd", interaction_fm_fwd),
        ("interaction_fm_bwd", interaction_fm_bwd),
        ("transpose", transpose_fwd),
    )
    only = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None
    for name, body in stages:
        if only and name not in only:
            continue
        ms = chain_time(body) * 1e3
        print(f"{name:16s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
