"""Minimal repro for the XLA:CPU mmap-exhaustion crash (jaxlib 0.9.0).

Interpret-mode Pallas executables hold O(1000) mmap regions each while jit
caches keep them alive.  Once the process map count nears the kernel's
``vm.max_map_count`` (default 65530), the next XLA:CPU compile crashes
with SIGSEGV/SIGABRT instead of raising.  See
docs/xla_cpu_mmap_exhaustion.md for the full evidence chain.

Run:  python docs/repro_mmap_crash.py [iters]
Expected: the map count climbs ~1,150 per iteration and never drops; at
the kernel's vm.max_map_count (default 65,530) the process dies hard
(SIGSEGV/SIGABRT, no Python exception) mid-compile — ~55 iterations
(tens of minutes of compile time; the default 8 iterations just
demonstrate the monotone growth).  Uncomment the ``jax.clear_caches()``
line to see the count return to baseline instead.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def n_maps():
    with open(f"/proc/{os.getpid()}/maps") as f:
        return sum(1 for _ in f)


def make_interpret_pipeline(i, n_kernels=256):
    """A jitted function wrapping many *distinct* interpret-mode pallas
    calls, the shape every combblas_tpu interpret test takes.  ``i`` varies
    the static shape so each iteration compiles a fresh executable.  XLA:CPU
    splits a large program into many LLVM modules for parallel codegen;
    every module is its own ORC JIT allocation = 3 mmap regions
    (r-xp/r--p/rw-p anon) held for the life of the cached executable.
    Measured: ~1,150 new maps per compile at these settings, never
    released until `jax.clear_caches()`."""
    size = 512 + 8 * i

    def make_kern(j):
        def kern(x_ref, o_ref):
            y = x_ref[...] * (2.0 + j) + jnp.float32(j)
            o_ref[...] = jnp.cumsum(y) * 0.5 + jnp.sort(y)
        return kern

    @jax.jit
    def fn(x):
        for j in range(n_kernels):
            x = pl.pallas_call(
                make_kern(j),
                out_shape=jax.ShapeDtypeStruct((size,), jnp.float32),
                interpret=True,
            )(x)
        return x.sum()

    return fn, jnp.arange(size, dtype=jnp.float32)


if __name__ == "__main__":
    import sys
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    for i in range(iters):
        fn, x = make_interpret_pipeline(i)
        fn(x).block_until_ready()
        print(f"iter {i:3d}  maps={n_maps()}", flush=True)
        # jax.clear_caches()  # <- uncomment: maps stay at baseline
