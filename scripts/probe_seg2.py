"""Per-slab timing probe for the seg2 pipeline: fits secs ~ a + b*flops +
c*padded per slab to locate fixed overhead vs traffic cost.  Shapes are
already cached from the scale-18/21 runs; run AFTER those."""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=18)
    ap.add_argument("--flops-cap", type=int, default=1 << 28)
    ap.add_argument("--refgen", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from combblas_tpu.gen.rmat import rmat_matrix
    from combblas_tpu.ops.spgemm_seg import (
        seg2_prepare,
        seg2_step,
        seg_zero_state,
    )
    from combblas_tpu.semiring import PLUS_TIMES

    if args.refgen:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench_ref"))
        from inputs import load_ref_coo

        a = load_ref_coo(args.scale)
    else:
        a = rmat_matrix(jax.random.PRNGKey(42), scale=args.scale,
                        edgefactor=8, probs=(0.6, 0.4 / 3, 0.4 / 3, 0.4 / 3))
    prep = seg2_prepare(a, a, flops_cap=args.flops_cap)
    cfg = prep[1]
    print(json.dumps({"slabs": len(cfg["slabs"]),
                      "shapes": len(cfg["shapes"]),
                      "pad_ratio": round(cfg["pad_ratio"], 3)}), flush=True)
    zero = seg_zero_state()
    # warm every shape
    seen = {}
    for s, sl in enumerate(cfg["slabs"]):
        seen.setdefault((sl["w"], sl["s_pad"], sl["nnz_cap"],
                         sl["chunk_cap"], sl.get("flat", False),
                         sl.get("flat_stream_cap", 0)), s)
    for i, s in enumerate(seen.values()):
        sl = cfg["slabs"][s]
        print(json.dumps({"warm": i, "of": len(seen), "slab": s,
                          "w": sl["w"], "s_pad": sl["s_pad"],
                          "flat": sl.get("flat", False)}), flush=True)
        t0 = time.perf_counter()
        st = seg2_step(a, prep, s, zero, PLUS_TIMES)
        _ = int(st[0])
        print(json.dumps({"warmed": i, "secs": round(
            time.perf_counter() - t0, 1)}), flush=True)
    # timed pass, per slab
    state = zero
    rows = []
    for s, sl in enumerate(cfg["slabs"]):
        t0 = time.perf_counter()
        state = seg2_step(a, prep, s, state, PLUS_TIMES)
        _ = int(state[0])
        dt = time.perf_counter() - t0
        rows.append((s, sl["w"], sl["s_pad"], sl["cnt"], sl["flops"],
                     sl["padded"], sl["nnz_cap"], sl["chunk_cap"],
                     round(dt * 1000, 1)))
    print("s w s_pad cnt flops padded nnz_cap chunk_cap ms")
    for r in rows:
        print(*r, flush=True)
    import numpy as np

    fl = np.array([r[4] for r in rows], float)
    pd = np.array([r[5] for r in rows], float)
    ms = np.array([r[8] for r in rows], float)
    X = np.stack([np.ones_like(fl), fl / 1e6, pd / 1e6], axis=1)
    coef, *_ = np.linalg.lstsq(X, ms, rcond=None)
    print(json.dumps({"fit_ms": {"fixed": round(coef[0], 2),
                                 "per_Mflop": round(coef[1], 4),
                                 "per_Mpadded": round(coef[2], 4)},
                      "total_ms": round(float(ms.sum()), 1)}), flush=True)


if __name__ == "__main__":
    main()
