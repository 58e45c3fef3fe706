"""Device mesh construction.

The scaling axes of this domain (SURVEY.md §2.4): 'data' for batch/data
parallelism (gradients psum over ICI), 'model' for row-sharded embedding
tables (the large axis is nfeat, up to millions of rows — not the field
count). Multi-host bring-up goes through jax.distributed.initialize.
"""

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["parse_mesh_spec", "make_mesh", "maybe_initialize_distributed"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def parse_mesh_spec(spec):
    """'data:4,model:2' -> dict. Empty spec -> all devices on 'data'.
    A size of -1 means 'all remaining devices'."""
    if not spec:
        return {DATA_AXIS: -1}
    out = {}
    for part in spec.split(","):
        name, _, size = part.partition(":")
        name = name.strip()
        if not name:
            raise ValueError(f"bad mesh spec {spec!r}")
        if name in out:
            raise ValueError(f"duplicate axis {name!r} in mesh spec {spec!r}")
        n = int(size) if size else -1
        if n == 0 or n < -1:
            raise ValueError(
                f"axis {name!r} size must be positive or -1 (got {n}) in "
                f"mesh spec {spec!r}")
        out[name] = n
    return out


def make_mesh(spec="", devices=None):
    """Build a Mesh from a spec string over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    axes = parse_mesh_spec(spec)
    n = len(devices)
    known = 1
    wild = None
    for name, size in axes.items():
        if size == -1:
            if wild is not None:
                raise ValueError("only one axis may have size -1")
            wild = name
        else:
            known *= size
    if wild is not None:
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        axes[wild] = n // known
    total = int(np.prod(list(axes.values())))
    if total != n:
        raise ValueError(f"mesh {axes} needs {total} devices, have {n}")
    arr = np.asarray(devices).reshape(tuple(axes.values()))
    return Mesh(arr, tuple(axes.keys()))


def maybe_initialize_distributed():
    """Multi-host bring-up: call jax.distributed.initialize() when the runtime
    environment advertises a coordinator (no-op on a single host).

    jax.distributed.initialize resolves JAX_COORDINATOR_ADDRESS itself but
    relies on cluster auto-detection (slurm / TPU pod metadata) for
    num_processes / process_id — on plain hosts (and in the dryrun) those
    arrive as JAX_NUM_PROCESSES / JAX_PROCESS_ID, so pass them explicitly
    when present."""
    import os

    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if not addr:
        return False
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if (nproc is None) != (pid is None):
        # fail loud: silently dropping the set half would send this process
        # into cluster auto-detection with a wrong/absent identity while the
        # other hosts block at the coordinator barrier
        raise ValueError(
            "set BOTH JAX_NUM_PROCESSES and JAX_PROCESS_ID (or neither, on "
            f"auto-detecting pod environments); got num_processes={nproc!r} "
            f"process_id={pid!r}")
    if nproc is not None and pid is not None:
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=int(nproc),
                                   process_id=int(pid))
    else:   # pod environments: auto-detect the rest
        jax.distributed.initialize(coordinator_address=addr)
    return True
