"""Device (JAX/XLA/Pallas) kernels for the batched analysis and synthesis
paths. float64 is enabled process-wide: the CPU analysis path uses it for
near-reference coefficient parity; the TPU path runs float32 by default."""

from jax import config as _config

_config.update("jax_enable_x64", True)
