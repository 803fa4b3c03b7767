"""Command-line entry points (train / export / evaluate / export_eval).

Importing this package enables JAX's persistent compilation cache for
every CLI: over the TPU tunnel a cold compile of the staged HA pipeline
or the train step costs minutes per process, and CLI processes are
short-lived by design (supervised restarts, per-checkpoint sweep
children, export jobs) — without the on-disk cache each one recompiled
from scratch (measured: 20-image 384×1248 HA export spent 280 of 282 s
compiling on its second, fully-warm run).  Library users importing
``ssp`` itself are unaffected.  Override the location with
``JAX_COMPILATION_CACHE_DIR``; disable with ``SSP_NO_COMPILE_CACHE=1``.
"""

import os


def _enable_compile_cache() -> None:
    if os.environ.get("SSP_NO_COMPILE_CACHE"):
        return
    import jax

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_ssp")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


_enable_compile_cache()
