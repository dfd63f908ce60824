"""Test configuration: force an 8-device virtual CPU platform.

Distributed paths are exercised exactly the way the reference exercises MPI
with ``mpiexec -n 4/16`` on one box (SURVEY.md §4): JAX's forced host platform
device count gives us a real 8-device mesh on CPU, so every shard_map/collective
path runs unmodified.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the (tunneled,
# single) TPU, which would serialize every tiny test op over the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the suite is compile-bound, not compute-bound.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/combblas_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
