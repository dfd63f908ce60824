"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: R-MAT A² semiring SpGEMM throughput on one chip (products/s), the
direct counterpart of the reference's SCALE21/22 RMATxRMAT SpGEMM benchmark
(BASELINE.md: scale-21 DoubleBuff SUMMA = 51.3 s/iter on 1 Ranger core).

vs_baseline compares product-formation rate (semiring multiplies/s): the
reference's scale-21 rate is flops(scale-21 A²)/51.3 s.  flops(A²) for the
Graph500 R-MAT generator at scale 21 ≈ 1.600e9 products (measured with
spgemm_flops on our generator with G500 probabilities; the generator matches
Graph500 statistics, see combblas_tpu/gen/rmat.py).  That gives the reference
~3.12e7 products/s/core.  We report our rate at the largest scale that fits
one chip, measured end-to-end (expand+sort+compress, full C materialized).

Extra metrics (printed as additional JSON lines only with --all): SpMM
dense-roofline, BFS GTEPS — the driver consumes the first line.
"""

import argparse
import json
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compile cache — TPU compiles go through a remote
    service here (~40 s each); caching makes repeated bench runs cheap."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/combblas_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_spgemm(scale: int, edgefactor: int, iters: int, max_flops_cap: int):
    import jax
    from combblas_tpu.gen.rmat import rmat_matrix
    from combblas_tpu.ops.spgemm import (
        spgemm,
        spgemm_bounds,
        spgemm_rowchunked,
        _slab_bounds_host,
        spgemm_flops,
    )

    key = jax.random.PRNGKey(42)
    a = rmat_matrix(key, scale=scale, edgefactor=edgefactor)
    flops = int(spgemm_flops(a, a))
    fc, oc = spgemm_bounds(a, a)
    if fc <= max_flops_cap:
        def run():
            return spgemm(a, a, flops_cap=fc, out_capacity=oc)
    else:
        num_slabs = -(-fc // max_flops_cap)
        slab_cap, slab_rows = _slab_bounds_host(a, a, num_slabs)
        out_cap = min(oc, 1 << 30)
        def run():
            return spgemm_rowchunked(
                a, a, num_slabs=num_slabs, slab_rows=slab_rows,
                flops_cap=slab_cap, out_capacity=out_cap,
            )

    c = run()
    jax.block_until_ready(c.val)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        c = run()
        jax.block_until_ready(c.val)
    dt = (time.perf_counter() - t0) / iters
    return dict(
        scale=scale,
        nnz_a=int(a.nnz),
        flops=flops,
        nnz_c=int(c.nnz),
        secs=dt,
        products_per_s=flops / dt,
        nnz_c_per_s=int(c.nnz) / dt,
    )


# Reference throughput: scale-21 R-MAT A², 51.3 s/iter on 1 core
# (BASELINE.md / ReleaseTests/SCALE21RMATRMAT/btwcent1.1256709.out), with
# flops(scale-21 A²) ≈ 1.600e9 on the G500 generator.
REF_PRODUCTS_PER_S = 1.600e9 / 51.3


def main():
    _enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=18)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--max-flops-cap", type=int, default=1 << 27)
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    r = bench_spgemm(args.scale, args.edgefactor, args.iters, args.max_flops_cap)
    print(
        json.dumps(
            {
                "metric": f"rmat_scale{args.scale}_A2_spgemm_products_per_s",
                "value": round(r["products_per_s"] / 1e6, 2),
                "unit": "Mproducts/s",
                "vs_baseline": round(r["products_per_s"] / REF_PRODUCTS_PER_S, 3),
                "detail": {k: v for k, v in r.items() if k != "products_per_s"},
            }
        )
    )


if __name__ == "__main__":
    main()
