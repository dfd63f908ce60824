"""Probe 2: SSCA-parameter R-MAT (the reference's own SpGEMM benchmark
generator: initiator (.6, .4/3, .4/3, .4/3), edgefactor 8 —
``3DSpGEMM/mpipspgemm.cpp:135-141``) — flops growth toward scale-22, plus
wide-path validation on the real TPU at scale 14/16 (G500 ef16, known nnz_c).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from combblas_tpu.gen.rmat import rmat_matrix
from combblas_tpu.ops.spgemm import (
    round_capacity_frac,
    spgemm_flops,
    spgemm_pallas_rowchunked,
    spgemm_pallas_streamed,
)

SSCA = (0.6, 0.4 / 3, 0.4 / 3, 0.4 / 3)

# -- wide-path validation on hardware: same matrix, narrow vs wide ----------
KNOWN = {14: 20143729, 16: 163341763}
for scale in (14, 16):
    a = rmat_matrix(jax.random.PRNGKey(42), scale=scale, edgefactor=16)
    fl = spgemm_flops(a, a)
    mem_slabs = max(-(-fl // (1 << 27)), 2)
    tight = round_capacity_frac(KNOWN[scale])
    for wide in (False, True):
        t0 = time.perf_counter()
        c = spgemm_pallas_rowchunked(a, a, num_slabs=mem_slabs,
                                     out_capacity=tight, wide=wide)
        nnz_c = int(c.nnz)
        cold = time.perf_counter() - t0
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            c = spgemm_pallas_rowchunked(a, a, num_slabs=mem_slabs,
                                         out_capacity=tight, wide=wide)
            n2 = int(c.nnz)
            _ = float(np.asarray(jax.device_get(c.val[n2 - 1])))
            ts.append(time.perf_counter() - t0)
        ok = "OK" if nnz_c == KNOWN[scale] else f"MISMATCH({nnz_c})"
        print(f"scale={scale} wide={wide} {ok} cold={cold:.2f}s "
              f"warm={min(ts):.3f}s rate={fl/min(ts)/1e6:.1f} Mp/s",
              flush=True)
        del c
    # streamed digest must agree with the materialized nnz
    tot, cks, trunc = spgemm_pallas_streamed(a, a, num_slabs=mem_slabs,
                                             wide=True)
    print(f"scale={scale} streamed nnz={int(tot)} trunc={bool(trunc)} "
          f"{'OK' if int(tot) == KNOWN[scale] else 'MISMATCH'}", flush=True)
    del a

# -- SSCA flops growth -------------------------------------------------------
for scale in (14, 16, 18, 20, 21, 22):
    t0 = time.perf_counter()
    a = rmat_matrix(jax.random.PRNGKey(42), scale=scale, edgefactor=8,
                    probs=SSCA)
    fl = spgemm_flops(a, a)
    print(f"SSCA scale={scale} ef8 nnz_a={int(a.nnz)} flops={fl} "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)
    del a
