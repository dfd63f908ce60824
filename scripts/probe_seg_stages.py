"""Per-stage timing of the SEGMENTED ESC pipeline at headline-like slab
sizes — attribution data for the next optimization target.

Stages (one slab, the heaviest of the plan): meta build, narrow stride=0
expansion, row-flops map + class grouping sort, per-class window gathers,
per-class batched sorts, concat, compress.  Each stage is its own jit with
inputs passed as arguments (HLO-literal closures blow the remote compile
service's request cap)."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, sync, iters=3):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=18)
    ap.add_argument("--max-flops-cap", type=int, default=1 << 27)
    args = ap.parse_args()

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
        _slab_extract,
        _tables_2d,
        round_capacity_frac,
        spgemm_flops,
    )
    from combblas_tpu.ops.spgemm_seg import (
        _class_windows,
        _row_flops_exact,
        seg_plan,
    )
    from combblas_tpu.semiring import PLUS_TIMES

    SSCA = (0.6, 0.4 / 3, 0.4 / 3, 0.4 / 3)
    scale = args.scale
    a = rmat_matrix(jax.random.PRNGKey(42), scale=scale, edgefactor=8,
                    probs=SSCA)
    flops = int(spgemm_flops(a, a))
    num_slabs = max(-(-flops // args.max_flops_cap), 2)
    plan = seg_plan(a, a, num_slabs)
    k = a.shape[1]
    bounds_dev = jnp.asarray(plan["bounds"])
    span_cap = plan["span_cap"]
    classes = plan["classes"]
    s_caps = plan["s_caps"]
    b_rp = a.row_ptr()
    bc2, bv2 = _tables_2d(a)
    slab_out_cap = max(
        -(-round_capacity_frac(max(plan["worst_fl"], 2048)) // 128) * 128,
        2048)

    # heaviest slab = the one with max flops (plan is equal-flops; pick 0)
    s = jnp.asarray(0, jnp.int32)
    ext = jax.jit(lambda ar, br, bnd, sv: _slab_extract(
        ar, k, bnd, sv, span_cap=span_cap,
        slab_nnz_cap=plan["slab_nnz_cap"]))
    sub, _ = ext(a, a, bounds_dev, s)
    print('stage ext ready', flush=True)

    meta_j = jax.jit(lambda r, c, v, mk, lo, hi: build_chunk_meta(
        r, c, v, mk, lo, hi, 0, plan["chunk_cap"]))
    meta_fn = lambda: meta_j(sub.row, sub.col, sub.val, sub.mask(),
                             b_rp[:-1], b_rp[1:])
    meta, metaf, _, _ = meta_fn()
    print('stage meta ready', flush=True)

    exp_j = jax.jit(lambda meta, metaf, bc, bv: expand_chunks_compact(
        meta, metaf, bc, bv, PLUS_TIMES, stream_cap=plan["stream_cap"]))
    exp_fn = lambda: exp_j(meta, metaf, bc2, bv2)
    colstream, valstream, _tot = exp_fn()
    print('stage expand ready', flush=True)

    rf_j = jax.jit(lambda sb, rp: _row_flops_exact(sb, rp, span_cap))
    rf_fn = lambda: rf_j(sub, b_rp)
    rowfl, row_start = rf_fn()
    print('stage rowfl ready', flush=True)

    win_j = jax.jit(lambda cs, vs, rf, rs: _class_windows(
        cs, vs, rf, rs, classes=classes, s_caps=s_caps, span_cap=span_cap))
    win_fn = lambda: win_j(colstream, valstream, rowfl, row_start)
    wins = win_fn()
    print('stage windows ready', flush=True)

    def sort_all(wins):
        out = []
        for (c2, v2, _r, _l) in wins:
            sc, sv = jax.lax.sort((c2, v2), dimension=1, num_keys=1)
            out.append((sc, sv))
        return out

    sort_j = jax.jit(sort_all)
    sort_fn = lambda: sort_j(wins)
    sorted_parts = sort_fn()
    print('stage sorts ready', flush=True)

    cat_j = jax.jit(lambda parts: (
        jnp.concatenate([p[0].reshape(-1) for p in parts]),
        jnp.concatenate([p[1].reshape(-1) for p in parts])))
    cat_fn = lambda: cat_j(sorted_parts)
    cat_k, cat_v = cat_fn()
    print('stage concat ready', flush=True)

    comp_j = jax.jit(lambda ck, cv: compress_sorted_packed_pallas(
        ck, cv, PLUS_TIMES, out_capacity=slab_out_cap))
    comp_fn = lambda: comp_j(cat_k, cat_v)

    res = {
        "scale": scale,
        "slab_flops": plan["worst_fl"],
        "padded": plan["padded"],
        "meta_ms": round(timeit(meta_fn, lambda o: float(
            jnp.sum(o[0][:, 2].astype(jnp.float32)))) * 1e3, 1),
        "expand_ms": round(timeit(exp_fn, lambda o: float(
            jnp.sum(o[1][:1000]))) * 1e3, 1),
        "rowfl_ms": round(timeit(rf_fn, lambda o: int(o[0][0])) * 1e3, 1),
        "windows_ms": round(timeit(win_fn, lambda o: float(
            jnp.sum(o[0][1][:, :8]))) * 1e3, 1),
        "sorts_ms": round(timeit(sort_fn, lambda o: float(
            jnp.sum(o[0][1][:, :8]))) * 1e3, 1),
        "concat_ms": round(timeit(cat_fn, lambda o: float(
            jnp.sum(o[1][:1000]))) * 1e3, 1),
        "compress_ms": round(timeit(comp_fn, lambda o: int(o[2])) * 1e3, 1),
    }
    res["sum_ms"] = round(sum(v for k, v in res.items()
                              if k.endswith("_ms")), 1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
