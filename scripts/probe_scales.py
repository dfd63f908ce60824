"""TPU probe: time the (new) equal-flops slab pipeline at scales 16-18 and
verify nnz against the host-measured reference kernel."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from combblas_tpu.gen.rmat import rmat_matrix
from combblas_tpu.ops.spgemm import (
    round_capacity_frac,
    spgemm_flops,
    spgemm_pallas_rowchunked,
    spgemm_pallas, spgemm_pallas_bounds, stream_capacity,
)

KNOWN_NNZ = {14: 20143729, 16: 163341763}

for scale, iters in ((16, 2), (17, 2), (18, 1)):
    a = rmat_matrix(jax.random.PRNGKey(42), scale=scale, edgefactor=16)
    fl = spgemm_flops(a, a)
    t0 = time.perf_counter()
    mem_slabs = max(-(-fl // (1 << 27)), 2)
    # discover nnz_c once
    est = round_capacity_frac(int(fl * 0.45))
    c = spgemm_pallas_rowchunked(a, a, num_slabs=mem_slabs, out_capacity=est)
    nnz_c = int(c.nnz)
    print(f"scale={scale} flops={fl} first(cold)={time.perf_counter()-t0:.2f}s "
          f"nnz_c={nnz_c} est={est}", flush=True)
    if scale in KNOWN_NNZ:
        assert nnz_c == KNOWN_NNZ[scale], (nnz_c, KNOWN_NNZ[scale])
    del c
    tight = round_capacity_frac(nnz_c)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        c = spgemm_pallas_rowchunked(a, a, num_slabs=mem_slabs,
                                     out_capacity=tight)
        # force the ENTIRE output (not just nnz): pull last live element
        n2 = int(c.nnz)
        tailv = float(np.asarray(jax.device_get(c.val[n2 - 1])))
        ts.append(time.perf_counter() - t0)
        del c
    dt = min(ts)
    print(f"scale={scale} warm={dt:.2f}s rate={fl/dt/1e6:.1f} Mproducts/s "
          f"(all warm: {['%.2f' % x for x in ts]})", flush=True)
    del a
