"""armnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) CTR feature-interaction
and scoring framework with the capabilities of nusdbsystem/ARM-Net.

Layers (bottom-up):
  ops/       pure-jnp op substrate (entmax, embedding-bag, FM, cross, CIN, ...)
  kernels/   hand-written Pallas TPU kernels + jnp twins for CPU testing
  models/    the full 21-name zoo on the shared substrate (registry here)
  data/      streaming libsvm pipeline (C++ fast parser + numpy fallback)
  parallel/  device mesh, sharding rules, row-sharded embedding + all-to-all
  train/     jitted train/eval steps, epoch driver, metrics, checkpointing
  utils/     logging, meters, seeding, config presets

Reference behavior documented against nusdbsystem/ARM-Net (file:line cites in
docstrings); the implementation is a from-scratch TPU-first design.
"""

__version__ = "0.1.0"
