"""Benchmark harness — prints ONE JSON line per metric, CHEAP LINES FIRST.

Delivery contract: the first JSON line (scale-14 G500-ef16 A² SpGEMM, the
round-over-round comparable metric) must appear within ~2 minutes warm /
~7 minutes cold; every further line streams as it completes.  The expensive
scale-22 headline runs LAST under an explicit wall-clock budget
(``--budget``, default 1500 s total) and reports partial slabs/s if the
budget expires mid-stream — so a driver timeout can never erase the run.

Headline (last line): R-MAT **scale-22** A² semiring SpGEMM on one chip,
the direct counterpart of the reference's SCALE22RMATRMAT MultTime
benchmark (`ReleaseTests/SCALE22RMATRMAT/btwcent1.1254794.out`: Synch
SUMMA = 109.1 s/iter on one 2009 Ranger core).  The workload uses the
reference's own SpGEMM-benchmark generator settings
(``3DSpGEMM/mpipspgemm.cpp:135-141``: R-MAT initiator (.6, .4/3, .4/3,
.4/3), edgefactor 8) at the log's scale.  The scale-22 product (~1.9e9
nnz) exceeds any single chip's memory — as it exceeded one Ranger node's.
The reference's answer is phasing (``MemEfficientSpGEMM``,
``ParFriends.h:450``: form, consume, release per phase); ours is the same:
every row slab's C block is fully formed, merged, and compacted on device,
folded into (nnz, checksum), and released (``spgemm_pallas_streamed``).
All products are formed and all duplicates merged — nothing is skipped.
Full unbudgeted scale-21/22 logs are committed under ``bench_logs/``.

Timing methodology: the device sits behind an async tunnel where
``block_until_ready`` can return early, so every timed iteration ends with a
scalar device->host pull that data-depends on the result.
"""

import argparse
import json
import os
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compile cache — TPU compiles go through a remote
    service here (tens of seconds each); caching makes repeat runs cheap."""
    import jax

    # Honor JAX_PLATFORMS=cpu even when a site hook force-registers the
    # TPU plugin via jax.config (config beats env): CI smoke runs on CPU.
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # /tmp first: it survives a `git clean` in the repo (the repo-local
    # dir is gitignored and may be wiped between driver runs) and is the
    # same dir the test conftest and run_headline use, so a warm-up run
    # earlier in the same boot leaves the driver's bench a warm cache.
    for d in ("/tmp/combblas_tpu_jax_cache", "/root/repo/.jax_cache"):
        try:
            jax.config.update("jax_compilation_cache_dir", d)
            break
        except Exception:
            continue
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# Reference MultTime Synch SUMMA wall times, 1 core (BASELINE.md,
# ReleaseTests/SCALE2{1,2,3}RMATRMAT/btwcent1.*.out)
REF_SCALE_SECS = {21: 51.3, 22: 109.1, 23: 224.3}
REF_SCALE22_SECS = REF_SCALE_SECS[22]

# Measured flop counts for the reference's SpGEMM benchmark workload family
# (SSCA initiator .6/.4-thirds, edgefactor 8 — 3DSpGEMM/mpipspgemm.cpp:135),
# produced by the reference's OWN generator (DistEdgeList single-rank path)
# and counted by the reference's OWN estimateFLOP (mtSpGEMM.h:1058).
# Committed artifact: bench_logs/ref_workload_provenance.log (harness:
# bench_ref/ref_workload.cpp).  'axb' = two structurally-similar draws (the
# MultTime input1 x input2 shape), 'a2' = one draw squared, 'scrambled' =
# two independently scrambled draws (hubs decorrelated).
REF_FAMILY_FLOPS = {
    21: dict(axb=3_194_475_359, a2=3_191_413_588, scrambled=121_955_706),
    22: dict(axb=8_033_094_533, a2=8_022_940_994, scrambled=250_279_475),
    23: dict(axb=20_182_582_805, a2=20_161_026_688, scrambled=498_503_288),
}
# Upper bound on the reference's demonstrated per-core rate: its logged
# wall time against the HEAVIEST plausible reading of its inputs
# (structurally-similar AxB).  Era-scaling evidence in the provenance log
# (the reference kernel needs ~200-450 s single-thread for that workload on
# a 2021 Xeon, vs 51.3 s logged on a 2009 core) says the actual inputs were
# almost certainly the far lighter scrambled family (~2.4 Mproducts/s), so
# dividing by this bound UNDERSTATES our advantage.
REF_BEST_RATE = {s: REF_FAMILY_FLOPS[s]["axb"] / REF_SCALE_SECS[s]
                 for s in REF_FAMILY_FLOPS}
REF_PRODUCTS_PER_S = REF_BEST_RATE[22]  # ~73.6 M products/s

SSCA = (0.6, 0.4 / 3, 0.4 / 3, 0.4 / 3)


def _kernel_source_key() -> str:
    """Hash of the SpGEMM kernel sources: a warm-cache marker is only
    trusted while the code that produced the cached executables is
    byte-identical (any kernel edit changes every compiled shape)."""
    import glob
    import hashlib

    import combblas_tpu.ops.spgemm as m2
    import combblas_tpu.ops.spgemm_seg as m1

    h = hashlib.sha256()
    pallas_dir = os.path.join(os.path.dirname(m1.__file__), "pallas")
    for f in [m1.__file__, m2.__file__] + sorted(
            glob.glob(os.path.join(pallas_dir, "*.py"))):
        with open(f, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:16]


def _warm_marker_path(scale: int, max_widths: int) -> str:
    """Marker recording a completed warm sweep for (scale, ladder, code).
    Lives INSIDE the compile-cache dir so it dies exactly when the cached
    executables do (fresh boot => no marker => budget-safe ladder)."""
    return os.path.join(
        "/tmp/combblas_tpu_jax_cache",
        f"warm_s{scale}_mw{max_widths}_{_kernel_source_key()}.marker")


def bench_spgemm22(scale: int, iters: int, max_flops_cap: int,
                   deadline: float | None = None,
                   max_widths: int | None = None):
    """Headline: A² of the REFERENCE's own generator output at scale
    ``scale`` (SSCA ef8, deterministic seed — bench_ref/inputs.py), through
    the sorted-row uniform-width streamed pipeline (seg2: every product
    formed + merged; output digested per slab).

    Running the reference generator's matrix removes every workload
    ambiguity: its flop count (~8.0e9 at scale 22) equals the reference's
    own estimateFLOP on the heaviest plausible reading of its benchmark
    inputs, so beating the logged 109.1 s wall time here beats the
    reference under EVERY interpretation of what input1/input2 were.  If
    the native harness cannot produce the dump, falls back to our threefry
    R-MAT (a ~1.8x HEAVIER workload — its in/out degrees are fully
    correlated, the reference generator's per-level noise decorrelates
    them).

    ``deadline`` is an absolute ``time.perf_counter()`` wall-clock cutoff:
    the slab loop syncs per slab and stops when it would overrun, reporting
    partial slabs/s."""
    import jax
    from combblas_tpu.ops.spgemm import spgemm_flops
    from combblas_tpu.ops.spgemm_seg import (
        seg2_prepare,
        seg2_step,
        seg_zero_state,
    )
    from combblas_tpu.semiring import PLUS_TIMES

    workload = f"refgen_ssca_ef8_A2_streamed_seg2"
    t_gen = time.perf_counter()
    try:
        import sys as _sys

        _sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "bench_ref"))
        from inputs import load_ref_coo

        a = load_ref_coo(scale)
    except Exception as e:
        from combblas_tpu.gen.rmat import rmat_matrix

        a = rmat_matrix(jax.random.PRNGKey(42), scale=scale, edgefactor=8,
                        probs=SSCA)
        workload = f"threefry_ssca_ef8_A2_streamed_seg2 (ref dump: {e})"
    gen_secs = time.perf_counter() - t_gen
    t_plan = time.perf_counter()
    flops = int(spgemm_flops(a, a))
    # Ladder size: 20 rungs (pad 1.36, 21 shapes) fits the 1500 s driver
    # budget even against a COLD compile cache (21 x ~30 s warm + plan +
    # timed pass ~ 1275 s incl. the cheap lines; measured r5).  28 rungs
    # (pad 1.27, ~29 shapes) is ~6 s/iter faster but only safe when every
    # shape is already compiled — so it is opt-in: used automatically only
    # when a warm marker proves a prior `--max-widths 28` sweep completed
    # on this boot with byte-identical kernel code.
    if max_widths is None:
        max_widths = 28 if os.path.exists(_warm_marker_path(scale, 28)) \
            else 20
    prep = seg2_prepare(a, a, flops_cap=max_flops_cap,
                        max_widths=max_widths)
    cfg = prep[1]
    num_slabs = len(cfg["slabs"])
    plan_secs = time.perf_counter() - t_plan

    def step(s, state):
        return seg2_step(a, prep, s, state, PLUS_TIMES)

    zero = seg_zero_state()
    # warm every distinct compiled shape BEFORE timing (digest state
    # discarded) — shapes load from the persistent cache in a few seconds
    # each; without this the first timed pass absorbs every compile.
    # Deadline-aware: if the budget runs short, remaining shapes compile
    # inside the timed loop (slower but still correct + reported).
    seen = {}
    for s, sl in enumerate(cfg["slabs"]):
        seen.setdefault((sl["w"], sl["s_pad"], sl["nnz_cap"],
                         sl["chunk_cap"], sl.get("flat", False),
                         sl.get("flat_stream_cap", 0)), s)
    def step_retry(s, state, tries=3):
        # the remote compile service occasionally drops an RPC mid-flight
        # ("response body closed", HTTP 500); transient — retry the step
        for t in range(tries):
            try:
                out = step(s, state)
                _ = int(out[0])  # hard sync via scalar pull
                return out
            except Exception:
                if t == tries - 1:
                    raise
                time.sleep(15)

    t_warm = time.perf_counter()
    for s in seen.values():
        step_retry(s, zero)
        if deadline is not None and time.perf_counter() > deadline - 180:
            break
    warm_secs = time.perf_counter() - t_warm
    slab_secs = []
    state = zero
    done = 0
    flops_done = 0
    t0 = time.perf_counter()
    for s in range(num_slabs):
        ts = time.perf_counter()
        state = step_retry(s, state)
        slab_secs.append(time.perf_counter() - ts)
        flops_done += cfg["slabs"][s]["flops"]
        done = s + 1
        if deadline is not None and done < num_slabs:
            mean = sum(slab_secs) / len(slab_secs)
            if time.perf_counter() + mean > deadline:
                break
    dt = time.perf_counter() - t0
    total_lo, total_hi, checksum, truncated = state
    partial = done < num_slabs
    if not partial:
        # every shape is now in the persistent cache: record that so the
        # next run on this boot can afford the finer ladder
        try:
            with open(_warm_marker_path(scale, max_widths), "w") as fh:
                fh.write(f"shapes={len(seen)} slabs={num_slabs}\n")
        except OSError:
            pass
    out = dict(
        scale=scale,
        workload=workload,
        nnz_a=int(a.nnz),
        flops=flops,
        max_widths=max_widths,
        pad_ratio=round(cfg["pad_ratio"], 3),
        slabs_done=done,
        slabs=num_slabs,
        shapes=len(seen),
        partial=partial,
        truncated=bool(truncated),
        gen_secs=round(gen_secs, 1),
        plan_secs=round(plan_secs, 1),
        warm_secs=round(warm_secs, 1),
        secs=round(dt, 3),
        est_full_secs=round(dt * flops / max(flops_done, 1), 3),
        products_per_s=flops_done / dt,
    )
    if not partial:
        out["nnz_c"] = int(total_lo) + (int(total_hi) << 16)
        out["checksum"] = float(checksum)
    return out


def bench_spgemm(scale: int, edgefactor: int, iters: int, max_flops_cap: int):
    """Materialized G500-ef16 A² (round-over-round comparable line)."""
    import jax
    from combblas_tpu.gen.rmat import rmat_matrix
    from combblas_tpu.ops.spgemm import (
        _slab_bounds_host,
        spgemm,
        spgemm_auto,
        spgemm_bounds,
        spgemm_flops,
        spgemm_rowchunked,
        round_capacity_frac,
        _pallas_backend_ok,
        _pallas_ok,
        spgemm_pallas,
        spgemm_pallas_bounds,
        spgemm_pallas_rowchunked,
        stream_capacity,
    )

    key = jax.random.PRNGKey(42)
    a = rmat_matrix(key, scale=scale, edgefactor=edgefactor)
    flops = int(spgemm_flops(a, a))
    fc, oc = spgemm_bounds(a, a)
    # symbolic-style output sizing: discover true nnz once (estimate-and-retry
    # inside spgemm_auto), then time with tight buffers — the steady state of
    # every iterated workload (MCL), and what the reference's symbolic pass
    # buys it.
    c0 = spgemm_auto(a, a, max_flops_cap=max_flops_cap)
    tight = round_capacity_frac(int(c0.nnz))
    chunk_cap = None
    if _pallas_backend_ok(a, a):
        chunk_cap, _ = spgemm_pallas_bounds(a, a)
        scap = stream_capacity(flops)
    if (chunk_cap is not None and _pallas_ok(a, a)
            and scap <= max(max_flops_cap, fc * 2)):
        def run():
            return spgemm_pallas(a, a, chunk_cap=chunk_cap,
                                 out_capacity=tight, stream_cap=scap)
    elif chunk_cap is not None:
        m, n = a.shape
        key_slabs = -(-(m + 1) // max((1 << 31) // (n + 1) - 1, 1))
        mem_slabs = -(-flops // max_flops_cap)
        wide = key_slabs > mem_slabs
        nslabs = max(mem_slabs, 2) if wide else max(key_slabs, mem_slabs, 2)

        def run():
            return spgemm_pallas_rowchunked(a, a, num_slabs=nslabs,
                                            out_capacity=tight, wide=wide)
    elif fc <= max_flops_cap:
        def run():
            return spgemm(a, a, flops_cap=fc, out_capacity=tight)
    else:
        num_slabs = -(-fc // max_flops_cap)
        slab_cap, slab_rows = _slab_bounds_host(a, a, num_slabs)
        def run():
            return spgemm_rowchunked(
                a, a, num_slabs=num_slabs, slab_rows=slab_rows,
                flops_cap=slab_cap, out_capacity=tight,
            )

    nnz_c = int(run().nnz)  # compile + warmup, hard sync
    t0 = time.perf_counter()
    for _ in range(iters):
        nnz_c = int(run().nnz)  # scalar pull forces execution
    dt = (time.perf_counter() - t0) / iters
    return dict(
        scale=scale,
        nnz_a=int(a.nnz),
        flops=flops,
        nnz_c=nnz_c,
        secs=round(dt, 4),
        products_per_s=flops / dt,
    )


def bench_spmm(scale: int, d: int, iters: int):
    """Sparse×tall-dense (SpMMError/Roofline path): GB/s streamed."""
    import jax
    import jax.numpy as jnp
    from combblas_tpu.gen.rmat import rmat_matrix
    from combblas_tpu.ops.spmv import spmm

    a = rmat_matrix(jax.random.PRNGKey(7), scale=scale, edgefactor=16)
    n = a.shape[1]
    x = jax.random.uniform(jax.random.PRNGKey(8), (n, d), jnp.float32)
    nnz = int(a.nnz)
    bytes_moved = nnz * (4 + 4 + 4) + nnz * d * 4 * 2  # gather + accumulate
    out = dict(scale=scale, d=d)
    best = None
    from combblas_tpu.ops.pallas.spmm_ell import spmm_ell_prepare

    prep = spmm_ell_prepare(a)
    # ``inner`` repeats ride INSIDE one jit (carry-fed so XLA cannot
    # elide them): the tunnel's ~25-40 ms per-dispatch latency would
    # otherwise swamp a ~5 ms kernel (the r4 bench measured exactly that)
    inner = 10

    def chain(step):
        @jax.jit
        def many(x):
            def body(i, acc):
                y = step(x + acc * 0)
                return acc + y[0, 0]
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0))
        return many

    for name, step in (
            ("pallas", chain(lambda xx: spmm(a, xx, use_pallas=True,
                                             prep=prep))),
            ("xla", chain(lambda xx: spmm(a, xx)))):
        s = float(step(x))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(max(iters, 3)):
            s = float(step(x))
        dt = (time.perf_counter() - t0) / (max(iters, 3) * inner)
        out[f"{name}_gb_per_s"] = round(bytes_moved / dt / 1e9, 1)
        out[f"{name}_secs"] = round(dt, 4)
        if best is None or dt < best:
            best = dt
    out["secs"] = round(best, 4)
    out["gb_per_s"] = bytes_moved / best / 1e9
    out["gflops"] = 2 * nnz * d / best / 1e9
    return out


def bench_bfs(scale: int, iters: int, nroots: int = 64, validate: int = 4):
    """BFS TEPS on a symmetrized R-MAT graph (``TopDownBFS.cpp:437-443``).

    Graph500-style methodology: 64 search keys sampled among vertices with
    degree >= 1 (the spec's key count); traversed edges counted as the sum
    of degrees of visited vertices / 2 (each undirected edge twice in the
    symmetrized adjacency); parents validated post-timing against the edge
    list for ``validate`` roots (``TopDownBFS.cpp:448-457``).  Runs the
    device-resident batched pull pipeline (``models/bfs.py:
    bfs_batch_pull_big``): ALL roots traverse in ONE dispatch through the
    blocked ELL-8 max kernel — one fused pull sweep per level computes hit
    detection and parent choice for all 64 roots at once, zero per-level
    host round trips.  Timing syncs on a scalar; the (R, n) result arrays
    stay on device (pulling 67 MB through the tunnel costs 2.2 s and is
    not part of the traversal — Graph500 likewise leaves kernel-2 output
    distributed)."""
    import jax
    from combblas_tpu.gen.rmat import rmat_matrix
    from combblas_tpu.models.bfs import bfs_batch_pull_big
    from combblas_tpu.ops.pallas.spmm_ell_blocked import ell_blocked_prepare

    a = rmat_matrix(jax.random.PRNGKey(9), scale=scale, edgefactor=16,
                    symmetrize=True, remove_self_loops=True)
    nnz = int(a.nnz)
    prep = ell_blocked_prepare(a, 6, relabel_cols=True, binary=True)
    rp = np.asarray(a.row_ptr())
    deg = rp[1:] - rp[:-1]
    cand = np.flatnonzero(deg > 0)
    rng = np.random.default_rng(1)
    roots = rng.choice(cand, size=min(nroots, len(cand)), replace=False)
    P, L = bfs_batch_pull_big(a, roots, prep=prep)  # compile + warm
    _ = int(jax.device_get(L[0, 0]))
    times = []
    for _ in range(max(iters, 2)):
        t0 = time.perf_counter()
        P, L = bfs_batch_pull_big(a, roots, prep=prep)
        _ = int(jax.device_get(L[0, 0]))  # data-dependent scalar sync
        times.append(time.perf_counter() - t0)
    batch_secs = min(times)
    per_root = batch_secs / len(roots)
    lv = np.asarray(L)
    vis = lv >= 0
    visited = int(vis[0].sum())
    edges = [int(deg[v].sum()) // 2 for v in vis]
    teps = [e / per_root for e in edges]
    hmean = len(teps) / sum(1.0 / t for t in teps if t > 0)
    ok = True
    arow, acol = np.asarray(a.row)[:nnz], np.asarray(a.col)[:nnz]
    ekeys = arow.astype(np.int64) * a.shape[1] + acol
    ekeys.sort()
    Ph = np.asarray(P)
    for i, r in enumerate(roots[:validate]):
        p, l = Ph[i], lv[i]
        visr = np.flatnonzero((l > 0))
        pe = p[visr].astype(np.int64) * a.shape[1] + visr
        found = np.searchsorted(ekeys, pe)
        ok &= bool(np.all(ekeys[np.minimum(found, len(ekeys) - 1)] == pe))
        ok &= bool(np.all(l[visr] == l[p[visr]] + 1))
        ok &= bool(p[r] == r and l[r] == 0)
    return dict(scale=scale, nnz=nnz, visited=visited, roots=len(roots),
                validated=bool(ok),
                batch_secs=round(batch_secs, 4),
                mean_secs=round(per_root, 4),
                gteps=hmean / 1e9)


def bench_spmsv(scale: int, iters: int, frontier_frac: float = 0.01):
    """Masked SpMSpV step timing (SpMSpV-IPDPS2017/SpMSpVBench counterpart):
    one frontier push on an R-MAT graph with a sparse frontier."""
    import jax
    import jax.numpy as jnp
    from combblas_tpu.gen.rmat import rmat_matrix
    from combblas_tpu.ops.spmv import spmsv_masked
    from combblas_tpu.semiring import MAX_SECOND

    a = rmat_matrix(jax.random.PRNGKey(11), scale=scale, edgefactor=16,
                    symmetrize=True)
    n = a.shape[0]
    k = max(1, int(n * frontier_frac))
    mask = jnp.zeros((n,), jnp.bool_).at[
        jax.random.choice(jax.random.PRNGKey(12), n, (k,), replace=False)
    ].set(True)
    vals = jnp.arange(1, n + 1, dtype=jnp.int32)
    # inner repeats ride one jit (mask fed forward so XLA cannot elide
    # them): a single SpMSpV step is far below the ~25-40 ms tunnel
    # dispatch floor, which is what the r4 line was measuring
    inner = 16

    @jax.jit
    def many(mask):
        def body(i, m):
            y, ym = spmsv_masked(a, vals, m, MAX_SECOND, transpose=True)
            return jnp.where(i < 0, ym, m) | (jnp.sum(ym) < 0)
        return jax.lax.fori_loop(0, inner, body, mask)

    y, ym = spmsv_masked(a, vals, mask, MAX_SECOND, transpose=True)
    touched = int(jnp.sum(ym))
    _ = bool(jax.device_get(many(mask)[0]))
    t0 = time.perf_counter()
    for _ in range(max(iters, 2)):
        _ = bool(jax.device_get(many(mask)[0]))
    dt = (time.perf_counter() - t0) / (max(iters, 2) * inner)
    return dict(scale=scale, frontier=k, reached=touched, secs=round(dt, 5),
                edges_per_s=int(int(a.nnz) / dt))


def bench_mcl(scale: int, max_secs: float = 150.0):
    """MCL (HipMCL) on one chip — the flagship application the
    phased/pruned SpGEMM machinery exists for (``Applications/MCL.cpp:515-686``,
    the IPDPS'20 HipMCL loop).  Times every iteration of the full pipeline
    (expansion SpGEMM + prune/select/recover + inflation + column
    renormalization + chaos) on an SSCA-style R-MAT under a wall-clock cap
    (VERDICT r4: the uncapped 505 s convergence run starved the headline
    budget).  Reports steady-state secs/iter (median of iterations >= 3 —
    iterations 1-2 carry the two compile generations of the frozen-plan
    discipline) separately from first-iteration compile time."""
    import jax
    from combblas_tpu.gen.rmat import rmat_matrix
    from combblas_tpu.models.mcl import MCLParams, mcl_local

    a0 = rmat_matrix(jax.random.PRNGKey(21), scale=scale, edgefactor=8,
                     probs=SSCA, symmetrize=True, remove_self_loops=True)
    # bounded selection: HipMCL's protein-network default (select=1100)
    # makes the expansion's product count scale as n*select^2 — beyond the
    # 2^31 sort limit at bench scales.  select=64 keeps the same
    # prune/select/recover machinery on a bench-sized budget
    # (-select/-recover_num are runtime params in the reference too,
    # MCL.cpp:233-371).
    p = MCLParams(select=64, recover_num=80)
    iter_secs, chaos_tail = [], []

    def on_iter(it, ch, secs):
        iter_secs.append(secs)
        chaos_tail.append(round(ch, 5))

    t0 = time.perf_counter()
    labels, iters = mcl_local(a0, p, on_iter=on_iter,
                              deadline=t0 + max_secs)
    total = time.perf_counter() - t0
    nclusters = int(len(np.unique(np.asarray(labels))))
    steady = sorted(iter_secs[2:] or iter_secs)
    steady = steady[len(steady) // 2]
    converged = chaos_tail[-1] < p.eps if chaos_tail else False
    return dict(scale=scale, nnz=int(a0.nnz), iters=int(iters),
                converged=bool(converged),
                first_iter_secs=round(iter_secs[0], 3) if iter_secs else None,
                steady_secs_per_iter=round(steady, 3),
                total_secs=round(total, 2), clusters=nclusters)


def bench_ewise(iters: int, inner: int = 256):
    """EWiseApply roofline sweep (``ReleaseTests/Roofline.cpp:69-81``).

    ``inner`` repeats ride INSIDE one jit (a fori_loop whose carry feeds
    the next apply) so the tunnel's per-dispatch latency (~25 ms round
    trip) is amortized — one dispatch per timed sample, as the reference's
    tight in-process loop has no per-op launch either.

    Each inner apply multiplies the carry by a FRESH slice of a buffer
    larger than VMEM, so the per-apply operand read is guaranteed HBM
    streaming, not a VMEM-resident reuse — the number is defensibly
    bytes-from-HBM like the reference's memory-streaming roofline.  Per
    element-op traffic: 1 fresh operand read + carry read/write."""
    import jax
    import jax.numpy as jnp

    big_len = 1 << 26  # 256 MB of f32 — far beyond v5e VMEM
    big = jax.random.uniform(jax.random.PRNGKey(3), (big_len,), jnp.float32)
    best = 0.0
    detail = {}
    for ln in (1 << 15, 1 << 20, 1 << 24):
        x = jax.random.uniform(jax.random.PRNGKey(1), (ln,), jnp.float32)
        nslices = big_len // ln

        @jax.jit
        def ew(x, big):
            def body(i, c):
                off = (i % nslices) * ln
                sl = jax.lax.dynamic_slice(big, (off,), (ln,))
                return c * sl + 1e-7
            return jnp.sum(jax.lax.fori_loop(0, inner, body, x))

        s = float(ew(x, big))
        t0 = time.perf_counter()
        for _ in range(iters):
            s = float(ew(x, big))
        dt = (time.perf_counter() - t0) / (iters * inner)
        detail[f"len_{ln}"] = round(ln / dt / 1e9, 2)
        best = max(best, ln / dt)
    return dict(gteps=best / 1e9, per_len_gteps=detail,
                hbm_gbps_lower_bound=round(best * 4 / 1e9, 1))


def main():
    _enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=22,
                    help="headline scale (reference log exists for 21/22/23)")
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--max-flops-cap", type=int, default=1 << 28)
    ap.add_argument("--max-widths", type=int, default=None,
                    help="seg2 width-ladder size; default: 28 when a warm "
                         "marker shows those shapes are cached this boot, "
                         "else the cold-budget-safe 20")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_SECS", 1500)),
                    help="total wall-clock budget (s); the scale-22 headline "
                         "stops mid-stream and reports partial slabs/s "
                         "rather than overrun it")
    ap.add_argument("--quick", action="store_true",
                    help="G500 scale-14 A² line only (old headline)")
    ap.add_argument("--smoke", action="store_true",
                    help="CI smoke: tiny scale-12 line, 1 iter (CPU-safe)")
    ap.add_argument("--headline-only", action="store_true",
                    help="skip fast lines; run only the budgeted headline")
    ap.add_argument("--all", action="store_true",
                    help="(kept for compat; secondary lines now always run "
                         "unless --quick)")
    args = ap.parse_args()
    t_start = time.perf_counter()

    def first_line(scale, iters):
        # materialized cheap lines keep the 2^27 slab budget: they hold the
        # full C plus slab buffers at once, and 2^28 slabs OOM at scale 16
        r = bench_spgemm(scale, args.edgefactor, iters,
                         min(args.max_flops_cap, 1 << 27))
        print(json.dumps({
            "metric": f"rmat_scale{scale}_A2_spgemm_products_per_s",
            "value": round(r["products_per_s"] / 1e6, 2),
            "unit": "Mproducts/s",
            "vs_baseline": round(r["products_per_s"] / REF_PRODUCTS_PER_S, 3),
            "detail": {k: v for k, v in r.items() if k != "products_per_s"},
        }), flush=True)

    if args.smoke:
        first_line(12, 1)
        return
    if args.quick:
        first_line(14, args.iters)
        return

    # ---- cheap, round-over-round-comparable lines FIRST ----
    if not args.headline_only:
        first_line(14, args.iters)
        for name, fn, kw in (
            ("rmat_scale16_A2_spgemm", bench_spgemm,
             dict(scale=16, edgefactor=16, iters=args.iters,
                  max_flops_cap=min(args.max_flops_cap, 1 << 27))),
            ("spmm_gbps", bench_spmm, dict(scale=16, d=128,
                                           iters=args.iters)),
            ("bfs_gteps", bench_bfs, dict(scale=18, iters=1)),
            ("spmsv", bench_spmsv, dict(scale=14, iters=args.iters)),
            ("mcl", bench_mcl, dict(scale=14)),
            ("ewise_gteps", bench_ewise, dict(iters=args.iters)),
        ):
            try:
                rr = fn(**kw)
                if "products_per_s" in rr:
                    rr["Mproducts_per_s"] = round(
                        rr.pop("products_per_s") / 1e6, 2)
                    rr["vs_ref_core"] = round(
                        rr["Mproducts_per_s"] * 1e6 / REF_PRODUCTS_PER_S, 3)
                print(json.dumps({"metric": name, "detail": rr}), flush=True)
            except Exception as e:  # secondary benches must not kill line 1
                print(json.dumps({"metric": name, "error": str(e)}),
                      flush=True)

    # ---- budgeted scale-22 headline LAST ----
    remaining = args.budget - (time.perf_counter() - t_start)
    metric = f"rmat_scale{args.scale}_A2_spgemm_products_per_s"
    if remaining < 240:  # not even one slab + compile would land
        print(json.dumps({
            "metric": metric, "skipped": "budget",
            "remaining_secs": round(remaining, 1),
            "committed_log": "bench_logs/",
        }), flush=True)
        return
    ref_secs = REF_SCALE_SECS.get(args.scale)
    try:
        deadline = t_start + args.budget
        r = bench_spgemm22(args.scale, args.iters, args.max_flops_cap,
                           deadline=deadline, max_widths=args.max_widths)
    except Exception as e:
        print(json.dumps({"metric": metric, "error": str(e)}), flush=True)
        return
    ref_rate = REF_BEST_RATE.get(args.scale, REF_PRODUCTS_PER_S)
    line = {
        "metric": metric,
        "value": round(r["products_per_s"] / 1e6, 2),
        "unit": "Mproducts/s",
        # products/s vs the reference's best-case demonstrated per-core
        # rate (its logged wall time over the measured flops of the
        # HEAVIEST plausible reading of its inputs — see REF_BEST_RATE
        # provenance above); the workload is the reference generator's own
        # matrix, so detail's wall-time ratio is equal-workload-or-harder
        "vs_baseline": round(r["products_per_s"] / ref_rate, 3),
        "detail": {k: v for k, v in r.items() if k != "products_per_s"},
    }
    if ref_secs is not None:
        line["detail"]["ref_1core_secs"] = ref_secs
        line["detail"]["time_ratio_vs_ref"] = round(
            ref_secs / r["est_full_secs"], 3)
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
