"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware isn't available in CI; shardings are validated on
XLA's host-platform virtual devices instead (same SPMD partitioner).

The container boots every Python process with a TPU-tunnel PJRT plugin
(registered from sitecustomize before any conftest runs); initializing
it from a CPU test run adds minutes of network stalls.  We deregister
the factory before JAX picks a backend and pin the platform to cpu.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from jax._src import xla_bridge  # noqa: E402

xla_bridge._backend_factories.pop("axon", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache — the CI host has one core; recompiles dominate
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
