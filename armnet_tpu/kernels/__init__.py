from armnet_tpu.kernels.config import kernel_backend, set_kernel_backend, use_pallas
