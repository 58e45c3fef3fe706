"""Kernel backend selection: 'xla' (pure jnp, runs everywhere) vs 'pallas'
(hand-written TPU kernels). 'auto' resolves to pallas on TPU, xla elsewhere.
The CLI --kernels flag sets this; tests exercise both via interpret mode."""

import threading

_state = threading.local()
_DEFAULT = "auto"


def set_kernel_backend(name):
    assert name in ("auto", "xla", "pallas"), name
    _state.backend = name


def kernel_backend():
    return getattr(_state, "backend", _DEFAULT)


def use_pallas():
    """Resolve the active backend to a concrete bool."""
    b = kernel_backend()
    if b == "pallas":
        return True
    if b == "xla":
        return False
    import jax

    return jax.default_backend() == "tpu"
