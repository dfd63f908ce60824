"""Per-stage timing of the Pallas ESC SpGEMM pipeline on the real chip.

Breaks ``spgemm_pallas`` (``ops/spgemm.py:466``) into its stages —
meta build, segment-DMA expansion, packed-key sort, streaming compress —
and times each with data-dependent scalar pulls, so DESIGN.md's roofline
table stays measurement-driven (the round-2 VERDICT's sort-bottleneck work
needs a current breakdown, not the round-1 numbers).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, sync, iters=5):
    sync(fn())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from combblas_tpu.gen.rmat import rmat_matrix
    from combblas_tpu.ops.pallas.compress_kernel import (
        compress_sorted_packed_pallas,
    )
    from combblas_tpu.ops.pallas.expand_kernel import (
        build_chunk_meta,
        expand_chunks_compact,
    )
    from combblas_tpu.ops.spgemm import (
        _tables_2d,
        round_capacity_frac,
        spgemm_flops,
        spgemm_pallas,
        spgemm_pallas_bounds,
        stream_capacity,
    )
    from combblas_tpu.semiring import PLUS_TIMES

    for scale in (14, 16):
        a = rmat_matrix(jax.random.PRNGKey(42), scale=scale, edgefactor=16)
        m, k = a.shape
        n = a.shape[1]
        stride = n + 1
        flops = int(spgemm_flops(a, a))
        chunk_cap, _ = spgemm_pallas_bounds(a, a)
        scap = stream_capacity(flops)
        b_rp = a.row_ptr()
        bc2, bv2 = _tables_2d(a)

        # NOTE: big arrays must ride as ARGUMENTS, not closures — a closed-
        # over device array is baked into the HLO as a literal and the
        # remote compile service rejects the multi-hundred-MB request body
        # (HTTP 413).
        meta_jit = jax.jit(lambda ar, ac, av, am, lob, hib: build_chunk_meta(
            ar, ac, av, am, lob, hib, stride, chunk_cap))
        meta_fn = lambda: meta_jit(a.row, a.col, a.val, a.mask(),
                                   b_rp[:-1], b_rp[1:])
        meta, metaf, _, _ = meta_fn()

        exp_jit = jax.jit(lambda meta, metaf, bc, bv: expand_chunks_compact(
            meta, metaf, bc, bv, PLUS_TIMES, stream_cap=scap))
        exp_fn = lambda: exp_jit(meta, metaf, bc2, bv2)
        key, val, _tot = exp_fn()

        sort_jit = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
        sort_fn = lambda: sort_jit(key, val)
        skey, sval = sort_fn()

        # tight output from one full run
        c = spgemm_pallas(a, a, chunk_cap=chunk_cap,
                          out_capacity=round_capacity_frac(flops),
                          stream_cap=scap)
        tight = round_capacity_frac(int(c.nnz))
        out_cap = max(-(-tight // 128) * 128, 2048)
        comp_jit = jax.jit(lambda k, v: compress_sorted_packed_pallas(
            k, v, PLUS_TIMES, out_capacity=out_cap))
        comp_fn = lambda: comp_jit(skey, sval)

        full_fn = lambda: spgemm_pallas(
            a, a, chunk_cap=chunk_cap, out_capacity=tight, stream_cap=scap)

        sync_last = lambda o: float(jnp.sum(o[-1] if isinstance(o, tuple)
                                            else o.val))
        res = {
            "scale": scale,
            "flops": flops,
            "nnz_c": int(c.nnz),
            "stream_cap": int(scap),
            "meta_ms": round(timeit(meta_fn, lambda o: float(
                jnp.sum(o[0][:, 2].astype(jnp.float32)))) * 1e3, 2),
            "expand_ms": round(timeit(exp_fn, lambda o: float(
                jnp.sum(o[1][:1000]))) * 1e3, 2),
            "sort_ms": round(timeit(sort_fn, lambda o: float(
                jnp.sum(o[1][:1000]))) * 1e3, 2),
            "compress_ms": round(timeit(comp_fn, lambda o: int(o[2])) * 1e3,
                                 2),
            "full_ms": round(timeit(full_fn, lambda o: int(o.nnz)) * 1e3, 2),
        }
        res["sum_stages_ms"] = round(
            res["meta_ms"] + res["expand_ms"] + res["sort_ms"]
            + res["compress_ms"], 2)
        print(json.dumps(res), flush=True)

    # --- batched-sort experiment: one long sort vs (S, L) batched sorts ---
    # The expansion stream is row-major, so it can be cut at output-row
    # boundaries into independent segments and sorted as a batch (sort
    # depth log^2 L instead of log^2 N).  If batched wins, the ESC sort
    # becomes gather-to-slabs + one batched sort.
    import numpy as np

    N = 1 << 26  # 67M, the scale-16-ish stream size
    key = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, 1 << 28,
                             dtype=jnp.int32)
    val = jax.random.uniform(jax.random.PRNGKey(1), (N,), jnp.float32)
    flat_jit = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    t_flat = timeit(lambda: flat_jit(key, val),
                    lambda o: float(jnp.sum(o[1][:1000])), iters=3)
    out = {"experiment": "batched_sort", "n": N,
           "flat_ms": round(t_flat * 1e3, 1)}
    b_jit = jax.jit(lambda k2, v2: jax.lax.sort(
        (k2, v2), dimension=1, num_keys=1))
    for S in (8, 64, 512):
        k2 = key.reshape(S, N // S)
        v2 = val.reshape(S, N // S)
        t_b = timeit(lambda: b_jit(k2, v2),
                     lambda o: float(jnp.sum(o[1][:, :10])), iters=3)
        out[f"batched_{S}_ms"] = round(t_b * 1e3, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
