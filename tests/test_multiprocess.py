"""REAL two-process multi-host dryrun (jax.distributed over two local CPU
processes). Slow (~2-3 min: two fresh jax inits + CPU compiles on one
core), so gated behind ARMNET_MULTIPROC=1; benchmarks/multiprocess_dryrun.py
is the same check as a standalone script (last recorded run: MULTIPROC_OK,
BENCH_NOTES.md r2)."""

import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(os.environ.get("ARMNET_MULTIPROC") != "1",
                    reason="slow 2-process run; set ARMNET_MULTIPROC=1")
def test_two_process_sharded_step_and_checkpoint():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "benchmarks", "multiprocess_dryrun.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)        # the script forces cpu itself
    out = subprocess.run([sys.executable, "-u", script], env=env,
                         capture_output=True, timeout=540, text=True)
    assert "MULTIPROC_OK" in out.stdout, out.stdout + out.stderr
