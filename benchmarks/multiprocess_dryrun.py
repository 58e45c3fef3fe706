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


def _run_pair(cmds_envs, tag, timeout=540):
    """Run two coupled processes; returns their outputs (or None on
    timeout). Output goes to files, not PIPEs — two jax.distributed
    processes block on each other's collectives, and a PIPE-buffer-full
    writer on one side deadlocks a sequential communicate() on the other."""
    procs, files = [], []
    for i, (cmd, env, cwd) in enumerate(cmds_envs):
        f = open(f"/tmp/armnet_mp_{tag}{i}.out", "w+b")
        files.append(f)
        procs.append(subprocess.Popen(cmd, env=env, cwd=cwd,
                                      stdout=f, stderr=subprocess.STDOUT))
    ok = True
    for p in procs:
        try:
            p.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            ok = False
            for q in procs:          # kill the exact children we started
                if q.poll() is None:
                    q.kill()
    outs = []
    for f in files:
        f.seek(0)
        outs.append(f.read().decode(errors="replace"))
        f.close()
    return procs, outs, ok


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
    from armnet_tpu.data.libsvm import BatchIterator, LibsvmDataset
    from armnet_tpu.models import ModelConfig, create_model
    from armnet_tpu.parallel.mesh import make_mesh
    from armnet_tpu.parallel.sharding import batch_sharding, state_shardings
    from armnet_tpu.train.step import (create_train_state, init_meters,
                                       make_train_step)
    from armnet_tpu.ops.embedding import sharded_lookup_context
    from jax.sharding import NamedSharding, PartitionSpec as P

    nfeat, nfield, bsz = 1024, 6, 64
    nrows = int(os.environ["_ARMNET_MP_ROWS"])
    data_path = os.environ["_ARMNET_MP_DATA"]
    mesh = make_mesh("data:4,model:2")          # spans both processes

    # PER-HOST SHARDED PARSE (SURVEY §3.5): each process parses only its
    # byte-range shard of the file — 1/P the startup work, 1/P the resident
    # rows — and contributes its local rows to each global batch.
    ds = LibsvmDataset(data_path, nfield, use_cache=False,
                       shard=(pid, jax.process_count()))
    from jax.experimental import multihost_utils
    lens = multihost_utils.process_allgather(jnp.array([len(ds)]))
    assert int(np.sum(lens)) == nrows, (
        f"shards must partition the file: {lens} vs {nrows} rows")
    assert all(int(x) > 0 for x in lens), "every process owns rows"
    sums = multihost_utils.process_allgather(
        jnp.array([np.sum(ds.ids, dtype=np.int64)]))
    full = LibsvmDataset(data_path, nfield, use_cache=False)  # oracle only
    assert int(np.sum(sums)) == int(np.sum(full.ids, dtype=np.int64)), (
        "shard row contents must partition the full parse")

    batch_sh = batch_sharding(mesh)
    it = BatchIterator(ds, bsz, shuffle=False, sharding=batch_sh,
                       local_shard_total=nrows)
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


def _write_libsvm(path, nrows, nfield, nfeat, seed):
    import numpy as np

    r = np.random.RandomState(seed)
    with open(path, "w") as fh:
        for _ in range(nrows):
            pairs = " ".join(f"{r.randint(0, nfeat)}:1"
                             for _ in range(nfield))
            fh.write(f"{r.randint(0, 2)} {pairs}\n")


def cli_stage():
    """Drive the PRODUCT entry point (train.main) as two jax.distributed
    processes: maybe_initialize_distributed picks up the coordinator env,
    make_dataloaders parses disjoint byte-range shards per process, Trainer
    builds the global mesh, and the a2a auto-capacity pre-pass agrees on one
    factor across processes (the cross-process max). This is the path a real
    pod user runs — the first stage above proves the pieces, this proves the
    wiring (VERDICT r3 #22: the bring-up helper existed but had no caller)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = "/tmp/armnet_mp_cli"
    ddir = os.path.join(base, "mpdata")
    os.makedirs(ddir, exist_ok=True)
    _write_libsvm(os.path.join(ddir, "tr.libsvm"), 200, 6, 1024, 0)
    _write_libsvm(os.path.join(ddir, "va.libsvm"), 80, 6, 1024, 1)
    _write_libsvm(os.path.join(ddir, "te.libsvm"), 80, 6, 1024, 2)
    cmds = []
    for pid in (0, 1):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                       + " --xla_force_host_platform_device_count=4").strip(),
            JAX_COORDINATOR_ADDRESS=f"localhost:{PORT + 1}",
            JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid),
            ARMNET_CACHE_DIR=os.path.join(base, "cache"),
        )
        cmd = [sys.executable, "-u", os.path.join(root, "train.py"),
               "--model", "armnet_1h", "--dataset", "mpdata",
               "--data_dir", base, "--nfield", "6", "--nfeat", "1024",
               "--nemb", "8", "--h", "8", "--mlp_nlayer", "1",
               "--mlp_nhid", "16", "--epoch", "1", "--batch_size", "64",
               "--lr", "0.01", "--mesh", "data:4,model:2",
               "--shard_embedding", "--embedding_exchange", "a2a",
               "--embedding_capacity_factor", "-1",  # exercise auto-cap sync
               "--exp_name", "mpcli", "--log_dir",
               os.path.join(base, f"log{pid}")]
        cmds.append((cmd, env, root))
    procs, outs, alive_ok = _run_pair(cmds, "cli")
    ok = alive_ok and all(p.returncode == 0 for p in procs) and all(
        "Total running time" in o for o in outs)
    # the auto-capacity agreement must have run on both processes
    ok = ok and all("global max across processes" in o for o in outs)
    for i, o in enumerate(outs):
        lines = o.splitlines()
        tail = [ln for ln in lines if "best valid auc" in ln
                or "Error" in ln or "error" in ln]
        print(f"[cli {i}] " + (tail[-1] if tail else
                               lines[-1] if lines else "<no output>"))
    return ok


def main():
    if "_ARMNET_MP_WORKER" in os.environ:
        worker(int(os.environ["_ARMNET_MP_WORKER"]))
        return
    # write the shared libsvm file the workers shard-parse (nfeat=1024, F=6)
    nrows, nfield, nfeat = 200, 6, 1024
    data_path = "/tmp/armnet_mp_data.libsvm"
    _write_libsvm(data_path, nrows, nfield, nfeat, 0)
    cmds = []
    for pid in (0, 1):
        env = dict(os.environ, _ARMNET_MP_WORKER=str(pid),
                   _ARMNET_MP_ROWS=str(nrows), _ARMNET_MP_DATA=data_path)
        cmds.append(([sys.executable, "-u", os.path.abspath(__file__)],
                     env, None))
    procs, outs, alive_ok = _run_pair(cmds, "w")
    ok = alive_ok and all(p.returncode == 0 for p in procs) and all(
        f"worker {i} OK" in outs[i] for i in (0, 1))
    for i, o in enumerate(outs):
        tail = [ln for ln in o.splitlines() if "OK" in ln or "Error" in ln]
        print(f"[proc {i}] " + (tail[-1] if tail else o.splitlines()[-1]
                                if o.splitlines() else "<no output>"))
    cli_ok = cli_stage()
    print(f"CLI stage: {'OK' if cli_ok else 'FAIL'}")
    ok = ok and cli_ok
    print("MULTIPROC_OK" if ok else "MULTIPROC_FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
