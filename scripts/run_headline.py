"""Offline headline runs: SSCA R-MAT A² streamed SpGEMM at scale 18/21/22.

Produces the committed measurement artifacts the driver-budgeted bench
cannot (full unbudgeted runs + the digest cross-validation), as JSON lines
with wall-clock stamps in ``bench_logs/``.

Reference counterparts: ``ReleaseTests/SCALE21RMATRMAT/btwcent1.1256709.out``
(51.3 s/iter, 1 Ranger core), ``SCALE22RMATRMAT/btwcent1.1254794.out``
(109.1 s/iter).  Generator settings: ``3DSpGEMM/mpipspgemm.cpp:135-141``
(initiator .6/.4-thirds, edgefactor 8).

At scale 18 the streamed digest (nnz, checksum) is cross-validated against
the independent materialized row-chunked pipeline — the check VERDICT r2
asked for: the digest path is only trustworthy at scale 21/22 if it agrees
with a materializing path where both run.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t_boot = time.time()


def log(obj):
    obj["t"] = round(time.time() - t_boot, 1)
    print(json.dumps(obj), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=int, nargs="+", default=[18, 21, 22])
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--max-flops-cap", type=int, default=1 << 28)
    ap.add_argument("--max-widths", type=int, default=20,
                    help="seg2 width-ladder size: compiled shapes vs "
                         "padding tradeoff (bench.py uses 20 too)")
    ap.add_argument("--seg", action="store_true",
                    help="segmented (within-row batched sort) pipeline")
    ap.add_argument("--seg2", action="store_true",
                    help="sorted-row uniform-width pipeline (seg2)")
    ap.add_argument("--two-input", action="store_true",
                    help="A x B of two independent draws (key 42 / 43) "
                         "instead of A^2 — the reference MultTime shape")
    ap.add_argument("--scramble", action="store_true",
                    help="independently scrambled draws (decorrelated "
                         "hubs — the reference benchmark family per "
                         "bench_logs/ref_workload provenance)")
    ap.add_argument("--refgen", action="store_true",
                    help="consume the REFERENCE generator's own matrices "
                         "(bench_ref/inputs.py dumps) — zero workload "
                         "ambiguity vs the reference logs")
    ap.add_argument("--no-crossval", action="store_true")
    args = ap.parse_args()

    import jax

    # same dir as bench.py/conftest so headline warm-ups leave the driver
    # bench a warm cache (and /tmp survives a repo `git clean`)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/combblas_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    from combblas_tpu.gen.rmat import rmat_matrix
    from combblas_tpu.ops.spgemm import (
        _pallas_slab_digest_step,
        _pallas_slab_plan,
        _tables_2d,
        round_capacity_frac,
        spgemm_flops,
        spgemm_pallas_rowchunked,
        stream_capacity,
    )
    from combblas_tpu.semiring import PLUS_TIMES

    SSCA = (0.6, 0.4 / 3, 0.4 / 3, 0.4 / 3)

    for scale in args.scales:
        try:
            run_scale(scale, args)
        except Exception as e:  # keep later scales alive
            log({"ev": "error", "scale": scale,
                 "err": f"{type(e).__name__}: {e}"})


def run_scale(scale, args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from combblas_tpu.gen.rmat import rmat_matrix
    from combblas_tpu.ops.spgemm import (
        _pallas_slab_digest_step,
        _pallas_slab_plan,
        _tables_2d,
        round_capacity_frac,
        spgemm_flops,
        spgemm_pallas_rowchunked,
        stream_capacity,
    )
    from combblas_tpu.semiring import PLUS_TIMES

    SSCA = (0.6, 0.4 / 3, 0.4 / 3, 0.4 / 3)
    if True:
        t0 = time.time()
        from combblas_tpu.gen.rmat import edges_to_coo, rmat_edges
        scramble = bool(getattr(args, "scramble", False))

        if args.refgen:
            sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "bench_ref"))
            from inputs import load_ref_coo

            def draw_ref(which):
                return load_ref_coo(scale, which)

            a = draw_ref("A")
            b = draw_ref("B") if args.two_input else a
        else:
            def draw(seed):
                n = 1 << scale
                r, c = rmat_edges(jax.random.PRNGKey(seed), scale, 8 * n,
                                  probs=SSCA, scramble=scramble)
                cap = 1 << int(np.ceil(np.log2(8 * n)))
                return edges_to_coo(r, c, (n, n), cap)

            a = draw(42)
            b = draw(43) if args.two_input else a
        nnz_a = int(a.nnz)
        log({"ev": "gen", "scale": scale, "nnz_a": nnz_a,
             "nnz_b": int(b.nnz), "two_input": bool(args.two_input),
             "scramble": scramble,
             "secs": round(time.time() - t0, 1)})
        t0 = time.time()
        flops = int(spgemm_flops(a, b))
        num_slabs = max(-(-flops // args.max_flops_cap), 2)
        if args.seg2:
            from combblas_tpu.ops.spgemm_seg import (
                seg2_prepare,
                seg2_step,
            )

            prep = seg2_prepare(a, b, flops_cap=args.max_flops_cap,
                                max_widths=args.max_widths)
            cfg = prep[1]
            num_slabs = len(cfg["slabs"])
            log({"ev": "plan", "scale": scale, "flops": flops,
                 "pipeline": "seg2", "slabs": num_slabs,
                 "shapes": len(cfg["shapes"]),
                 "padded": cfg["padded"],
                 "pad_ratio": round(cfg["pad_ratio"], 3),
                 "secs": round(time.time() - t0, 1)})

            def step(s, state):
                return seg2_step(b, prep, s, state, PLUS_TIMES)
        elif args.seg:
            from combblas_tpu.ops.spgemm_seg import (
                seg_prepare,
                seg_step,
                seg_zero_state,
            )

            prep = seg_prepare(a, b, num_slabs)
            num_slabs = len(prep[0]["bounds"]) - 1
            log({"ev": "plan", "scale": scale, "flops": flops,
                 "pipeline": "seg", "slabs": num_slabs,
                 "padded": prep[0]["padded"],
                 "pad_ratio": round(
                     prep[0]["padded"] / max(prep[0]["worst_fl"], 1), 3),
                 "secs": round(time.time() - t0, 1)})

            def step(s, state):
                return seg_step(a, b, prep, s, state, PLUS_TIMES)
        else:
            bounds, span_cap, slab_nnz_cap, chunk_cap, worst_fl = \
                _pallas_slab_plan(a, b, num_slabs, wide=True)
            num_slabs = len(bounds) - 1
            slab_out_cap = max(
                -(-round_capacity_frac(max(worst_fl, 2048)) // 128) * 128,
                2048)
            scap = stream_capacity(worst_fl)
            bounds_dev = jnp.asarray(bounds)
            log({"ev": "plan", "scale": scale, "flops": flops,
                 "slabs": num_slabs, "chunk_cap": int(chunk_cap),
                 "slab_out_cap": int(slab_out_cap),
                 "secs": round(time.time() - t0, 1)})

            a_rp = b.row_ptr()  # slab-invariant B-side row map, once
            a_tables = _tables_2d(b)

            def step(s, state):
                return _pallas_slab_digest_step(
                    a, b, a_rp, a_tables, bounds_dev,
                    jnp.asarray(s, jnp.int32), *state,
                    PLUS_TIMES, span_cap=span_cap,
                    slab_nnz_cap=slab_nnz_cap,
                    chunk_cap=chunk_cap, slab_out_cap=slab_out_cap,
                    stream_cap=scap, wide=True, interpret=False)

        zero = (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                jnp.asarray(0.0, jnp.float32), jnp.asarray(False))
        t0 = time.time()
        if args.seg2:
            # warm every distinct compiled shape (digest state discarded)
            seen = {}
            for s, sl in enumerate(prep[1]["slabs"]):
                key = (sl["w"], sl["s_pad"], sl["nnz_cap"],
                       sl["chunk_cap"], sl.get("flat", False),
                       sl.get("flat_stream_cap", 0))
                seen.setdefault(key, s)
            for i, s in enumerate(seen.values()):
                w = step(s, zero)
                _ = int(w[0])
                if (i + 1) % 10 == 0:
                    log({"ev": "warm_progress", "done": i + 1,
                         "of": len(seen), "t_secs": round(time.time() - t0, 1)})
        else:
            w = step(0, zero)
            _ = int(w[0])
        log({"ev": "warm", "scale": scale,
             "secs": round(time.time() - t0, 1)})

        best = None
        for it in range(args.iters):
            state = zero
            t0 = time.time()
            for s in range(num_slabs):
                state = step(s, state)
            _ = int(state[0])  # hard sync via scalar pull
            dt = time.time() - t0
            nnz_c = int(state[0]) + (int(state[1]) << 16)
            rec = {"ev": "iter", "scale": scale, "iter": it,
                   "secs": round(dt, 2), "nnz_c": nnz_c,
                   "checksum": float(state[2]),
                   "truncated": bool(state[3]),
                   "products_per_s": round(flops / dt / 1e6, 2)}
            log(rec)
            if best is None or dt < best["secs"]:
                best = rec
        ref = {21: 51.3, 22: 109.1, 23: 224.3}.get(scale)
        summary = {"ev": "summary", "scale": scale, "nnz_a": nnz_a,
                   "pipeline": ("seg2" if args.seg2 else
                                "seg" if args.seg else "flat"),
                   "two_input": bool(args.two_input),
                   "scramble": bool(getattr(args, "scramble", False)),
                   "flops": flops, "slabs": num_slabs,
                   "best_secs": best["secs"], "nnz_c": best["nnz_c"],
                   "checksum": best["checksum"],
                   "truncated": best["truncated"],
                   "Mproducts_per_s": best["products_per_s"]}
        if ref is not None:
            summary["ref_1core_secs"] = ref
            summary["time_ratio_vs_ref"] = round(ref / best["secs"], 2)
        log(summary)

        if scale == 18 and not args.no_crossval:
            # digest cross-validation vs the materialized row-chunked path
            t0 = time.time()
            m, n = a.shape
            key_slabs = -(-(m + 1) // max((1 << 31) // (n + 1) - 1, 1))
            mem_slabs = -(-flops // args.max_flops_cap)
            wide = key_slabs > mem_slabs
            nslabs = max(mem_slabs, 2) if wide else max(
                key_slabs, mem_slabs, 2)
            out_cap = round_capacity_frac(best["nnz_c"])
            c = spgemm_pallas_rowchunked(a, b, num_slabs=nslabs, wide=wide,
                                         out_capacity=out_cap)
            nnz_m = int(c.nnz)
            v = np.asarray(c.val)[:nnz_m]
            cks_m = float(np.sum(v, dtype=np.float64))
            rel = abs(cks_m - best["checksum"]) / max(1.0, abs(cks_m))
            log({"ev": "crossval", "scale": scale,
                 "materialized_nnz": nnz_m, "streamed_nnz": best["nnz_c"],
                 "nnz_match": nnz_m == best["nnz_c"],
                 "materialized_checksum_f64": cks_m,
                 "streamed_checksum_f32": best["checksum"],
                 "checksum_rel_err": rel,
                 "secs": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
