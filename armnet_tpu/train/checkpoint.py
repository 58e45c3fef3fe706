"""Checkpoint/resume — actually wired into the training loop (the reference
defines save/load helpers but never calls them from train.py; SURVEY.md §5).

Arrays (params / batch_stats / opt_state / step) go through Orbax
(sharding-aware, multi-host ready); run metadata goes to a JSON sidecar so the
restore template never has to guess its structure.
Layout: {ckpt_dir}/{tag}/ with tag in {'last', 'best'} + {tag}.meta.json.
Fallback backend: flax msgpack (single-host) when Orbax is unavailable.
"""

import json
import os
import shutil

import jax

__all__ = ["save_checkpoint", "load_checkpoint"]


def _orbax():
    try:
        import orbax.checkpoint as ocp
        return ocp
    except Exception:
        return None


def _state_pytree(state):
    return {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}


def _barrier(name):
    """Cross-process sync so filesystem mutations (rmtree before a save)
    are ordered; no-op on one process."""
    if jax.process_count() > 1:  # pragma: no cover - needs a real pod
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def save_checkpoint(ckpt_dir, state, extra=None, tag="last", is_best=False):
    """Persist the train-state arrays + a JSON metadata sidecar.

    Sharded/multi-host aware: the live (possibly device-sharded) arrays go
    straight to Orbax, which writes each shard from its owning process — a
    jax.device_get here would fail on non-addressable shards and funnel the
    whole state through one host."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    path = os.path.join(ckpt_dir, tag)
    primary = jax.process_index() == 0
    ocp = _orbax()
    if ocp is not None:
        ckptr = ocp.StandardCheckpointer()
        if primary and os.path.exists(path):
            shutil.rmtree(path)
        _barrier(f"ckpt_clear_{tag}")
        ckptr.save(path, _state_pytree(state))
        ckptr.wait_until_finished()
    else:  # pragma: no cover
        from flax import serialization
        payload = jax.device_get(_state_pytree(state))
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(payload))
    if primary:
        with open(os.path.join(ckpt_dir, f"{tag}.meta.json"), "w") as f:
            json.dump(extra or {}, f)

        if is_best and tag != "best":
            best = os.path.join(ckpt_dir, "best")
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)
            shutil.copyfile(os.path.join(ckpt_dir, f"{tag}.meta.json"),
                            os.path.join(ckpt_dir, "best.meta.json"))
    _barrier(f"ckpt_done_{tag}")
    return path


def load_checkpoint(ckpt_dir, state, tag="last"):
    """Restore into an existing TrainState template; returns (state, extra).

    Accepts either the checkpoint ROOT (containing last/ and best/) or a
    direct tag directory (.../last) — passing the deeper path is the
    natural CLI mistake and both spellings are unambiguous."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    base = os.path.basename(ckpt_dir)
    if base in ("last", "best") and not os.path.isdir(
            os.path.join(ckpt_dir, tag)) and os.path.isdir(ckpt_dir):
        ckpt_dir, tag = os.path.dirname(ckpt_dir), base
    path = os.path.join(ckpt_dir, tag)
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"no '{tag}' checkpoint under {ckpt_dir} (pass the checkpoint "
            f"root containing last/ and best/, or a tag directory itself)")
    ocp = _orbax()
    if ocp is not None:
        # live template: restoring against the sharded state rebuilds each
        # array with its original sharding on its owning processes
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path, target=_state_pytree(state))
    else:  # pragma: no cover
        from flax import serialization
        template = jax.device_get(_state_pytree(state))
        with open(os.path.join(path, "state.msgpack"), "rb") as f:
            restored = serialization.from_bytes(template, f.read())
    meta_path = os.path.join(ckpt_dir, f"{tag}.meta.json")
    extra = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            extra = json.load(f)
    state = state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"], step=restored["step"])
    return state, extra
