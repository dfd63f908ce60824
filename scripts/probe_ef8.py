"""Probe: flops(A^2) and nnz_c ratios for ef8 R-MAT at increasing scales —
calibrates the scale-22 headline workload against the reference's
SCALE22RMATRMAT logs (109.1 s/iter, 1 core)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from combblas_tpu.gen.rmat import rmat_matrix
from combblas_tpu.ops.spgemm import spgemm_auto, spgemm_flops

for scale in (14, 16, 18, 20, 21, 22):
    t0 = time.perf_counter()
    a = rmat_matrix(jax.random.PRNGKey(42), scale=scale, edgefactor=8)
    fl = spgemm_flops(a, a)
    print(f"scale={scale} ef8 nnz_a={int(a.nnz)} flops={fl} "
          f"(gen+flops {time.perf_counter()-t0:.1f}s)", flush=True)
    if scale <= 18:
        c = spgemm_auto(a, a, max_flops_cap=1 << 27)
        print(f"  nnz_c={int(c.nnz)} ratio={int(c.nnz)/fl:.3f}", flush=True)
        del c
    del a
