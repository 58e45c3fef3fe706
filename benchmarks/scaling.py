#!/usr/bin/env python
"""Scaling-efficiency benchmark: train-step throughput vs mesh size.

Runs the flagship armnet_1h training step over growing device meshes and
reports examples/s plus scaling efficiency relative to the 1-device run
(north-star target: >=80% at >=2 hosts, BASELINE.md). On a real pod slice
this measures ICI-scaled data parallelism (+ optional row-sharded tables);
on a CPU host it validates the harness over a virtual device mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarks/scaling.py --max_devices 8 --batch_per_device 512

Timing uses the same honest protocol as bench.py: steps chained inside one
jitted lax.scan, marginal cost between chain lengths, host fetch as the
barrier (the tunneled single-TPU backend does not honor block_until_ready).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n_devices, batch_per_device, nfeat, nfield, shard_embedding,
            chain=(1, 6), reps=3, exchange="psum"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from armnet_tpu.models import ModelConfig, create_model
    from armnet_tpu.parallel.mesh import make_mesh
    from armnet_tpu.parallel.sharding import batch_sharding, state_shardings
    from armnet_tpu.train.step import (create_train_state, init_meters,
                                       make_train_step)

    batch_size = batch_per_device * n_devices
    cfg = ModelConfig(model="armnet_1h", nfeat=nfeat, nfield=nfield, nemb=10,
                      h=128, mlp_nlayer=2, mlp_nhid=500, alpha=2.0)
    model = create_model(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "id": jnp.asarray(rng.randint(0, nfeat, (batch_size, nfield)),
                          jnp.int32),
        "value": jnp.ones((batch_size, nfield), jnp.float32),
        "y": jnp.asarray(rng.randint(0, 2, (batch_size,)).astype(np.float32)),
        "mask": jnp.ones((batch_size,), jnp.float32),
    }
    state = create_train_state(model, batch, lr=1e-3, seed=0)

    shardings = None
    if n_devices > 1:
        model_par = 2 if (shard_embedding and n_devices % 2 == 0) else 1
        mesh = make_mesh(f"data:{n_devices // model_par},model:{model_par}",
                         devices=jax.devices()[:n_devices])
        state_sh = state_shardings(state, mesh, nfeat, shard_embedding)
        state = jax.device_put(state, state_sh)
        batch_sh = batch_sharding(mesh)
        batch = jax.device_put(batch, batch_sh)
        from jax.sharding import NamedSharding, PartitionSpec as P
        meters_sh = jax.tree.map(lambda _: NamedSharding(mesh, P()),
                                 init_meters())
        shardings = (state_sh, meters_sh, batch_sh)

    lookup_cm = None
    if shardings is not None and shard_embedding:
        # activate the row-sharded lookup dispatch (psum or DLRM-style a2a)
        # exactly as the product Trainer does (train/loop.py:178-179)
        import functools

        from armnet_tpu.ops.embedding import sharded_lookup_context
        lookup_cm = functools.partial(sharded_lookup_context, mesh, exchange,
                                      capacity_factor=4.0)

    step = make_train_step(shardings=shardings, lookup_cm=lookup_cm)
    key = jax.random.key(0)

    def make_chain(n):
        @jax.jit
        def chainf(state, meters):
            def body(c, _):
                s, m = c
                s, m = step(s, m, batch, key)
                return (s, m), ()
            (s, m), _ = jax.lax.scan(body, (state, meters), None, length=n)
            return m["loss_last"]
        return chainf

    times = {}
    for n in chain:
        c = make_chain(n)
        float(c(state, init_meters()))
        t0 = time.perf_counter()
        for _ in range(reps):
            float(c(state, init_meters()))
        times[n] = (time.perf_counter() - t0) / reps
    step_s = (times[chain[1]] - times[chain[0]]) / (chain[1] - chain[0])
    return batch_size / step_s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max_devices", type=int, default=None)
    p.add_argument("--batch_per_device", type=int, default=4096)
    p.add_argument("--nfeat", type=int, default=2_100_000)
    p.add_argument("--nfield", type=int, default=39)
    p.add_argument("--shard_embedding", action="store_true")
    p.add_argument("--embedding_exchange", type=str, default="psum",
                   choices=["psum", "a2a"])
    args = p.parse_args()

    # this host's axon site hook registers the tunneled TPU regardless of
    # JAX_PLATFORMS; honor an explicit cpu request (virtual-mesh validation)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    navail = len(jax.devices())
    maxd = min(args.max_devices or navail, navail)
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= maxd]

    rows = []
    base = None
    for d in sizes:
        exs = measure(d, args.batch_per_device, args.nfeat, args.nfield,
                      args.shard_embedding, exchange=args.embedding_exchange)
        base = base or exs
        eff = exs / (base * d)
        rows.append({"devices": d, "examples_per_sec": round(exs, 1),
                     "scaling_efficiency": round(eff, 3)})
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"metric": "scaling_table", "rows": rows}))


if __name__ == "__main__":
    main()
