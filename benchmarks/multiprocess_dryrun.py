#!/usr/bin/env python
"""REAL multi-process dryrun: two jax.distributed processes on one host
(CPU backend, 4 virtual devices each -> 8-device global mesh) run one
sharded train step with per-process batch assembly.

This exercises everything a real pod run does except the transport:
jax.distributed.initialize, a global ('data','model') mesh spanning both
processes, row-sharded tables with the a2a exchange, BatchIterator's
process-local row slicing + make_array_from_process_local_data (each
process materializes ONLY its own rows), cross-process psum of gradients,
and the sharded Orbax checkpoint save (process-0 filesystem mutations +
barriers).

    python benchmarks/multiprocess_dryrun.py            # launcher
    (spawns itself twice with _WORKER=0/1)

Prints MULTIPROC_OK from the launcher if both workers succeed.
"""

import os
import subprocess
import sys

PORT = int(os.environ.get("ARMNET_MP_PORT", 59797))


def worker(pid):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from armnet_tpu.data.libsvm import BatchIterator
    from armnet_tpu.models import ModelConfig, create_model
    from armnet_tpu.parallel.mesh import make_mesh
    from armnet_tpu.parallel.sharding import batch_sharding, state_shardings
    from armnet_tpu.train.step import (create_train_state, init_meters,
                                       make_train_step)
    from armnet_tpu.ops.embedding import sharded_lookup_context
    from jax.sharding import NamedSharding, PartitionSpec as P

    nfeat, nfield, bsz = 1024, 6, 64
    mesh = make_mesh("data:4,model:2")          # spans both processes

    class DS:
        def __init__(self, n, seed=0):
            r = np.random.RandomState(seed)     # same data on both procs
            self.ids = r.randint(0, nfeat, (n, nfield)).astype(np.int32)
            self.values = np.ones((n, nfield), np.float32)
            self.labels = r.randint(0, 2, (n,)).astype(np.float32)
            self.nfield = nfield

        def __len__(self):
            return self.labels.shape[0]

    batch_sh = batch_sharding(mesh)
    it = BatchIterator(DS(200), bsz, shuffle=False, sharding=batch_sh)
    batch = next(iter(it))                      # process-local assembly
    assert batch["id"].shape == (bsz, nfield)   # global logical shape

    cfg = ModelConfig(model="armnet_1h", nfeat=nfeat, nfield=nfield, nemb=8,
                      h=8, mlp_nlayer=1, mlp_nhid=16, alpha=2.0)
    model = create_model(cfg)
    state = create_train_state(model, batch, lr=1e-2, seed=0)
    state_sh = state_shardings(state, mesh, nfeat, shard_embedding=True)
    state = jax.device_put(state, state_sh)
    meters_sh = jax.tree.map(lambda _: NamedSharding(mesh, P()),
                             init_meters())

    import functools
    lookup_cm = functools.partial(sharded_lookup_context, mesh, "a2a",
                                  capacity_factor=8.0)
    step = make_train_step(shardings=(state_sh, meters_sh, batch_sh),
                           lookup_cm=lookup_cm)
    state, meters = step(state, init_meters(), batch, jax.random.key(0))
    # replicated scalar: read this process's addressable shard
    loss = float(np.asarray(meters["loss_last"].addressable_shards[0].data))
    assert np.isfinite(loss), "non-finite loss"

    # sharded checkpoint save across processes (proc-0 fs mutations +
    # barriers); restore into the live template
    from armnet_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    ck = "/tmp/armnet_mp_ck"
    save_checkpoint(ck, state, extra={"loss": loss})
    restored, extra = load_checkpoint(ck, state)
    assert extra["loss"] == loss

    print(f"worker {pid} OK loss={loss:.4f}", flush=True)


def main():
    if "_ARMNET_MP_WORKER" in os.environ:
        worker(int(os.environ["_ARMNET_MP_WORKER"]))
        return
    procs = []
    for pid in (0, 1):
        env = dict(os.environ, _ARMNET_MP_WORKER=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    ok = all(p.returncode == 0 for p in procs) and all(
        f"worker {i} OK" in outs[i] for i in (0, 1))
    for i, o in enumerate(outs):
        tail = [ln for ln in o.splitlines() if "OK" in ln or "Error" in ln]
        print(f"[proc {i}] " + (tail[-1] if tail else o.splitlines()[-1]
                                if o.splitlines() else "<no output>"))
    print("MULTIPROC_OK" if ok else "MULTIPROC_FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
