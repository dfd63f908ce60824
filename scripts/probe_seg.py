"""Real-chip A/B of the segmented vs flat streamed SpGEMM digest.

Runs the SSCA R-MAT A-squared digest at the given scales through BOTH
pipelines, checks their (nnz, checksum) digests agree, and reports each
path's wall time — the decision record for routing the scale-21/22
headline through the segmented path (within-row batched sorts) instead of
the flat dual-key slab sort.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.time()


def log(obj):
    obj["t"] = round(time.time() - t0, 1)
    print(json.dumps(obj), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=int, nargs="+", default=[16, 18])
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--max-flops-cap", type=int, default=1 << 28)
    ap.add_argument("--skip-flat", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from combblas_tpu.gen.rmat import rmat_matrix
    from combblas_tpu.ops.spgemm import (
        spgemm_flops,
        spgemm_pallas_streamed,
    )
    from combblas_tpu.ops.spgemm_seg import seg_plan, spgemm_streamed_seg

    SSCA = (0.6, 0.4 / 3, 0.4 / 3, 0.4 / 3)
    for scale in args.scales:
        a = rmat_matrix(jax.random.PRNGKey(42), scale=scale, edgefactor=8,
                        probs=SSCA)
        flops = int(spgemm_flops(a, a))
        num_slabs = max(-(-flops // args.max_flops_cap), 2)
        plan = seg_plan(a, a, num_slabs)
        log({"ev": "plan", "scale": scale, "flops": flops,
             "slabs": len(plan["bounds"]) - 1,
             "classes": list(plan["classes"]),
             "s_caps": list(plan["s_caps"]),
             "padded": plan["padded"], "worst_fl": plan["worst_fl"],
             "pad_ratio": round(plan["padded"] / max(plan["worst_fl"], 1),
                                3)})

        res = {}
        for name, fn in (
            ("seg", lambda: spgemm_streamed_seg(
                a, a, num_slabs=num_slabs)),
            ("flat", lambda: spgemm_pallas_streamed(
                a, a, num_slabs=num_slabs, wide=True)),
        ):
            if name == "flat" and args.skip_flat:
                continue
            tw = time.perf_counter()
            out = fn()  # includes compile on first scale
            warm = time.perf_counter() - tw
            best = None
            for _ in range(args.iters):
                ti = time.perf_counter()
                out = fn()
                dt = time.perf_counter() - ti
                best = dt if best is None or dt < best else best
            res[name] = out
            log({"ev": name, "scale": scale, "warm_secs": round(warm, 2),
                 "best_secs": round(best, 3), "nnz": out[0],
                 "checksum": float(out[1]), "truncated": bool(out[2]),
                 "Mproducts_per_s": round(flops / best / 1e6, 2)})
        if "seg" in res and "flat" in res:
            ok = res["seg"][0] == res["flat"][0]
            rel = abs(float(res["seg"][1]) - float(res["flat"][1])) / max(
                1.0, abs(float(res["flat"][1])))
            log({"ev": "crossval", "scale": scale, "nnz_match": ok,
                 "checksum_rel_err": rel})


if __name__ == "__main__":
    main()
