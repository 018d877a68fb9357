"""Device (JAX/XLA/Pallas) kernels for the batched analysis and synthesis
paths. float64 is enabled process-wide: the CPU analysis path uses it for
near-reference coefficient parity; the TPU path runs float32 by default."""

import os as _os

from jax import config as _config

_config.update("jax_enable_x64", True)

# Persistent compilation cache: the analysis graphs are large (ridge x layer
# x unit-candidate sweeps) and TPU compilation is expensive; cache compiled
# executables across processes. Opt out with LINNE_NO_JIT_CACHE=1.
if not _os.environ.get("LINNE_NO_JIT_CACHE"):
    _cache_dir = _os.environ.get(
        "LINNE_JIT_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "linne_tpu_jit"))
    try:
        _config.update("jax_compilation_cache_dir", _cache_dir)
        _config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
