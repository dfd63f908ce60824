"""Cost model probes for the segmented ESC sort redesign.

The expansion stream is emitted in A-entry order, i.e. already sorted by
output row (``expand_kernel.py`` consumes chunks in meta order and
``build_chunk_meta`` preserves the row-sorted A layout).  The flat wide
sort (``lax.sort((hi, lo, val), num_keys=2)``) therefore re-discovers an
order the stream already has.  A segmented formulation sorts only within
rows (single int32 col key), with rows grouped into power-of-two size
classes so padding stays <= 2x.  Whether that wins depends on measured
ratios this script captures on the real chip:

  1. flat 3-stream 2-key sort at slab size (the incumbent, ~2^27)
  2. batched 2-stream 1-key sort at (S, L) for L in {2^14..2^20}
  3. windowed gather cost (vmap dynamic_slice: stream -> class layout)
  4. windowed scatter cost (vmap dynamic_update_slice: sorted -> stream)

Reference counterpart being chased: the per-column hash/heap accumulate
of ``mtSpGEMM.h:214`` costs O(flops) with small constants; the sort
formulation pays O(flops log^2) — cutting log^2(N=2^27)=729 substage
passes to log^2(L) of the row-size class is the available 2-4x.
"""

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
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    N = 1 << 27  # slab-sized stream (scale-21/22 slab = ~1.3e8 products)
    kh = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, 1 << 20,
                            dtype=jnp.int32)
    kh = jnp.sort(kh)  # hi (row) stream arrives presorted
    kl = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, 1 << 22,
                            dtype=jnp.int32)
    v = jax.random.uniform(jax.random.PRNGKey(2), (N,), jnp.float32)
    sync1 = lambda o: float(jnp.sum(o[-1][:1000]))

    # big arrays ride as jit ARGUMENTS — closed-over device arrays become
    # HLO literals and blow the remote compile service's request limit
    fw = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2))
    t = timeit(lambda: fw(kh, kl, v), sync1)
    print(json.dumps({"probe": "flat_wide_sort", "n": N,
                      "ms": round(t * 1e3, 1)}), flush=True)

    fn1 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
    t = timeit(lambda: fn1(kl, v), sync1)
    print(json.dumps({"probe": "flat_narrow_sort", "n": N,
                      "ms": round(t * 1e3, 1)}), flush=True)

    bsort = jax.jit(lambda a, b: jax.lax.sort((a, b), dimension=1,
                                              num_keys=1))
    for lg in (14, 16, 18, 20):
        L = 1 << lg
        S = N // L
        k2 = kl.reshape(S, L)
        v2 = v.reshape(S, L)
        t = timeit(lambda: bsort(k2, v2),
                   lambda o: float(jnp.sum(o[-1][:, :8])))
        print(json.dumps({"probe": f"batched_1key_L2^{lg}", "n": N,
                          "ms": round(t * 1e3, 1)}), flush=True)

    # windowed gather: S segments of <= L contiguous elements each
    for lg in (16, 18):
        L = 1 << lg
        S = N // L
        starts = jnp.sort(jax.random.randint(
            jax.random.PRNGKey(3), (S,), 0, N - L, dtype=jnp.int32))

        @jax.jit
        def gath(kl, v, starts, L=L):
            g = jax.vmap(lambda s: jax.lax.dynamic_slice(kl, (s,), (L,)))(
                starts)
            h = jax.vmap(lambda s: jax.lax.dynamic_slice(v, (s,), (L,)))(
                starts)
            return g, h

        t = timeit(lambda: gath(kl, v, starts),
                   lambda o: float(jnp.sum(o[1][:, :8])))
        print(json.dumps({"probe": f"window_gather_L2^{lg}", "n": N,
                          "ms": round(t * 1e3, 1)}), flush=True)

        g, h = gath(kl, v, starts)

        @jax.jit
        def scat(g, h, starts, S=S):
            out = jnp.zeros((N,), jnp.int32)
            outv = jnp.zeros((N,), jnp.float32)

            def body(i, c):
                o, ov = c
                o = jax.lax.dynamic_update_slice(o, g[i], (starts[i],))
                ov = jax.lax.dynamic_update_slice(ov, h[i], (starts[i],))
                return o, ov

            return jax.lax.fori_loop(0, S, body, (out, outv))

        t = timeit(lambda: scat(g, h, starts),
                   lambda o: float(jnp.sum(o[1][:1000])))
        print(json.dumps({"probe": f"window_scatter_L2^{lg}", "n": N,
                          "ms": round(t * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
