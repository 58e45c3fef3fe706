"""Test harness: force an 8-device virtual CPU mesh so sharding / collective
paths run without a TPU pod (SURVEY.md §4 test plan).

Note: this image's sitecustomize registers the axon TPU plugin and exports
JAX_PLATFORMS=axon before any user code runs, so env-var overrides alone are
ignored — the platform must be re-forced through jax.config after import."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, (
    "expected 8 virtual CPU devices; axon plugin override failed")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
