"""Kernel backend selection: 'xla' (pure jnp, runs everywhere) vs 'pallas'
(hand-written TPU kernels). 'auto' resolves to pallas on TPU, xla elsewhere.
'pallas-fused' additionally routes the ARM-1h interaction through the fully
fused single-kernel path (kernels/arm_pallas.py) — opt-in while its in-kernel
bisection lowering is slower than the standalone entmax kernel (see
BENCH_NOTES.md). The CLI --kernels flag sets this; tests exercise all modes
via interpret mode."""

import threading

_state = threading.local()
_DEFAULT = "auto"
BACKENDS = ("auto", "xla", "pallas", "pallas-fused")


def set_kernel_backend(name):
    assert name in BACKENDS, name
    _state.backend = name


def kernel_backend():
    return getattr(_state, "backend", _DEFAULT)


def use_pallas():
    """Resolve the active backend to a concrete bool."""
    b = kernel_backend()
    if b in ("pallas", "pallas-fused"):
        return True
    if b == "xla":
        return False
    import jax

    return jax.default_backend() == "tpu"


def use_fused_arm():
    """Fully fused ARM interaction kernel: explicit opt-in only."""
    return kernel_backend() == "pallas-fused"


_DTYPE_DEFAULT = "float32"


def set_compute_dtype(name):
    """Activation compute dtype: 'float32' or 'bfloat16' (--bf16). Embedding
    outputs are cast to this; the shared layers follow their input dtype, so
    the whole interaction/MLP path inherits it. Losses/metrics and the entmax
    solve stay f32."""
    assert name in ("float32", "bfloat16"), name
    _state.dtype = name


def compute_dtype():
    import jax.numpy as jnp

    return jnp.bfloat16 if getattr(_state, "dtype",
                                   _DTYPE_DEFAULT) == "bfloat16" else         jnp.float32
