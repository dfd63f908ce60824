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

import gc

import pytest

# Guard against vm.max_map_count exhaustion (root-caused round 5; see
# docs/xla_cpu_mmap_exhaustion.md).  Every interpret-mode Pallas pipeline
# compiles XLA:CPU executables that each hold O(1000) mmap regions for as
# long as jit caches keep them alive; a full suite run accumulates past the
# kernel's vm.max_map_count (65530 default) and the next mmap failure inside
# XLA surfaces as SIGSEGV/SIGABRT during compilation or executable
# (de)serialization.  Dropping the caches releases every region
# (measured: 6768 -> 541 maps); the persistent compile cache makes the
# re-warm cheap.
_MAP_GUARD_THRESHOLD = 35_000


def _n_maps() -> int:
    try:
        with open(f"/proc/{os.getpid()}/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux: no /proc, and no map_count limit either
        return 0


@pytest.fixture(autouse=True)
def _mmap_guard():
    yield
    if _n_maps() > _MAP_GUARD_THRESHOLD:
        jax.clear_caches()
        gc.collect()
