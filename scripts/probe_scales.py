"""Measure true (exact int64) flops + nnz for R-MAT A^2 across scales, and
stage-by-stage timing of the pallas slab path at scale 16.  TPU-only probe."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from combblas_tpu.gen.rmat import rmat_matrix
from combblas_tpu.ops.spgemm import spgemm_flops

def sync(x):
    return int(np.asarray(x.reshape(-1)[0])) if hasattr(x, 'reshape') else x

print("== flops sweep ==", flush=True)
for scale in (16, 17, 18, 19, 20, 21, 22):
    t0 = time.perf_counter()
    a = rmat_matrix(jax.random.PRNGKey(42), scale=scale, edgefactor=16)
    nnz = int(a.nnz)
    fl = spgemm_flops(a, a)
    # max row degree of A (hub size)
    from jax.ops import segment_sum
    deg = segment_sum(jnp.ones((a.capacity,), jnp.int32),
                      jnp.where(a.mask(), a.row, a.shape[0]),
                      num_segments=a.shape[0] + 1)[:a.shape[0]]
    mx = int(jnp.max(deg))
    print(f"scale={scale} nnz_a={nnz} flops={fl} maxdeg={mx} "
          f"t={time.perf_counter()-t0:.1f}s", flush=True)
    del a

print("== stage timing, scale 16 ==", flush=True)
scale = 16
a = rmat_matrix(jax.random.PRNGKey(42), scale=scale, edgefactor=16)
fl = spgemm_flops(a, a)
from combblas_tpu.ops.spgemm import (
    _pallas_slab, _pallas_slab_plan, round_capacity_frac, stream_capacity,
    spgemm_pallas_rowchunked,
)

m, n = a.shape
key_slabs = -(-(m + 1) // max((1 << 31) // (n + 1) - 1, 1))
mem_slabs = -(-fl // (1 << 27))
nslabs = max(key_slabs, mem_slabs, 2)
print(f"nslabs={nslabs} (key={key_slabs} mem={mem_slabs})", flush=True)
t0 = time.perf_counter()
num_slabs, slab_rows, slab_nnz_cap, chunk_cap, worst_fl = _pallas_slab_plan(a, a, nslabs)
print(f"plan: num_slabs={num_slabs} slab_rows={slab_rows} nnz_cap={slab_nnz_cap} "
      f"chunk_cap={chunk_cap} worst_fl={worst_fl} t={time.perf_counter()-t0:.2f}s",
      flush=True)
slab_out_cap = max(round_capacity_frac(min(worst_fl, max(2 * 167772160 // num_slabs, 2048))), 2048)
scap = stream_capacity(worst_fl)
print(f"slab_out_cap={slab_out_cap} stream_cap={scap} "
      f"total_sort_traffic={num_slabs*scap/1e6:.0f}M vs flops {fl/1e6:.0f}M", flush=True)

from combblas_tpu.semiring import PLUS_TIMES
# time one slab end to end (warm)
for s in range(num_slabs):
    t0 = time.perf_counter()
    part = _pallas_slab(a, a, jnp.asarray(s, jnp.int32), PLUS_TIMES,
                        slab_rows=slab_rows, slab_nnz_cap=slab_nnz_cap,
                        chunk_cap=chunk_cap, slab_out_cap=slab_out_cap,
                        stream_cap=scap)
    nnz_s = int(part[3])
    print(f"slab {s}: nnz={nnz_s} t={time.perf_counter()-t0:.2f}s (incl compile on first)",
          flush=True)
# warm second pass
t0 = time.perf_counter()
for s in range(num_slabs):
    part = _pallas_slab(a, a, jnp.asarray(s, jnp.int32), PLUS_TIMES,
                        slab_rows=slab_rows, slab_nnz_cap=slab_nnz_cap,
                        chunk_cap=chunk_cap, slab_out_cap=slab_out_cap,
                        stream_cap=scap)
    nnz_s = int(part[3])
print(f"warm slabs-only total: {time.perf_counter()-t0:.2f}s", flush=True)

# full call (includes assembly)
tight = round_capacity_frac(163341763)
t0 = time.perf_counter()
c = spgemm_pallas_rowchunked(a, a, num_slabs=nslabs, out_capacity=tight)
print(f"full rowchunked (cold assembly): {time.perf_counter()-t0:.2f}s nnz={int(c.nnz)}", flush=True)
t0 = time.perf_counter()
c = spgemm_pallas_rowchunked(a, a, num_slabs=nslabs, out_capacity=tight)
nnzc = int(c.nnz)
print(f"full rowchunked warm: {time.perf_counter()-t0:.2f}s nnz={nnzc}", flush=True)
