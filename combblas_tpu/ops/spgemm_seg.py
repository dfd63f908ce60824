"""Segmented (row-classed) ESC SpGEMM — the sort-bottleneck attack.

The Pallas expansion stream is emitted in A-entry order, which for a
row-sorted A means the product stream is ALREADY grouped by output row;
only the within-row order (B column ids) is unsorted.  The flat pipeline
(`ops/spgemm.py:spgemm_pallas_wide`) ignores this and re-sorts the whole
slab with a dual-int32-key sort — depth log^2(slab) ~= 729 compare
substages at slab = 2^27 — to recover an order that is 90 % already there.

This module sorts only WITHIN output rows:

  - each output row becomes one padded window of a power-of-two size class
    (class of a row with f products = floor_log2(f)+1, min 128 lanes, so a
    window is never exactly full and always ends with >= 1 sentinel);
  - windows of one class form a (S_c, 2^c) batch sorted along dim 1 with a
    SINGLE int32 key (the B column id) — measured mass-weighted depth on
    SSCA R-MAT is ~215 vs 729, with 2 sorted streams instead of 3;
  - window padding costs <= 2x on the heavy classes and ~2 % of total
    products on the tiny-row classes (97 % of R-MAT product mass sits in
    rows of 2^11..2^20 products — measured in scripts/probe_sort.py's
    companion distribution probe);
  - the concatenated class buffers feed the single-key compress kernel
    directly: within a window all duplicates are adjacent after the sort,
    across windows the guaranteed trailing sentinel separates runs, and
    the compress kernel drops sentinel keys wherever they appear.

Row identity never rides the stream: the expansion runs the NARROW
compacted kernel with stride=0 (key base = row*0 = 0), so the key stream
IS the raw B column id — one int32 stream fewer than the wide path in
expand, sort, and compress.

Reference counterpart: the per-column hash/heap accumulation of
``mtSpGEMM.h:214`` does O(flops) work with small constants; this gets the
sort formulation's constant down by the measured 2.5-4x while keeping the
all-duplicates-merged semantics (``MultiwayMerge.h:537``)."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from combblas_tpu.ops.coo import SpCOO
from combblas_tpu.ops.spgemm import (
    _pallas_slab_plan,
    _slab_extract,
    _tables_2d,
    check_sort_limit,
    round_capacity_frac,
    stream_capacity,
)
from combblas_tpu.semiring import PLUS_TIMES, Semiring

_SENT = jnp.iinfo(jnp.int32).max
_MIN_CLS = 7  # smallest window = 2^7 = one 128-lane vector register row


def _widths_upto(max_row: int):
    """Half-octave window widths 128, 192, 256, 384, 512, ... — first
    entry strictly greater than ``max_row`` is the last.  The 1.5x-spaced
    ladder keeps expected padding ~1.2x (vs ~1.4x for pure octaves) at the
    cost of ~2x more (still static) sort shapes."""
    out = []
    c = _MIN_CLS
    while True:
        for w in (1 << c, 3 << (c - 1)):
            out.append(w)
            if w > max_row:
                return out
        c += 1


def _width_gran(L: int) -> int:
    """Window count granularity so a class buffer S*L is a whole number of
    32768-element compress tiles."""
    import math

    return max(32768 // math.gcd(L, 32768), 1)


def _row_flops_exact(a: SpCOO, b_rp: jax.Array, span_cap: int):
    """Exact int32 per-slab-local-row product counts (span_cap+1,) and the
    exclusive cumsum of stream start offsets.  Rows are slab-local (pads
    land on span_cap).  Exactness matters: the class of a row bounds its
    window, and an undercounted row would silently truncate products."""
    kk = b_rp.shape[0] - 1
    acol = jnp.minimum(a.col, kk - 1)
    cnt = jnp.where(a.mask(), b_rp[acol + 1] - b_rp[acol], 0)
    rowfl = jax.ops.segment_sum(
        cnt, jnp.minimum(a.row, span_cap), num_segments=span_cap + 1
    )
    row_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(rowfl)[:-1]]
    )
    return rowfl, row_start


def seg_plan(a: SpCOO, b: SpCOO, num_slabs: int):
    """Host-side plan for the segmented pipeline.

    Extends :func:`ops.spgemm._pallas_slab_plan` (equal-flops row slabs,
    int32-safe per-slab flops) with the per-class window capacities:
    ``s_caps[i]`` = max over slabs of the number of rows in class
    ``classes[i]``, rounded so every class buffer is a whole number of
    compress tiles (32768 elements).  Returns a dict of static config."""
    m, k = a.shape
    bounds, span_cap, slab_nnz_cap, chunk_cap, worst_fl = _pallas_slab_plan(
        a, b, num_slabs, wide=True
    )
    # exact per-row flops over the WHOLE matrix, classed on host
    b_rp_host = np.asarray(b.row_ptr())
    nnz = int(a.nnz)
    arow = np.asarray(a.row)[:nnz]
    acol = np.minimum(np.asarray(a.col)[:nnz], k - 1)
    cnt = (b_rp_host[acol + 1] - b_rp_host[acol]).astype(np.int64)
    rowfl = np.bincount(arow, weights=cnt, minlength=m).astype(np.int64)
    max_row = int(rowfl.max(initial=1))
    widths = _widths_upto(max_row)
    nz = rowfl > 0
    warr = np.asarray(widths, np.int64)
    # class of a row = first width STRICTLY greater than its flops (so a
    # window always keeps >= 1 trailing sentinel)
    cls = np.searchsorted(warr, rowfl, side="right")
    S = len(bounds) - 1
    s_caps = []
    for i, w in enumerate(widths):
        per_slab = np.zeros((S,), np.int64)
        sel_rows = np.flatnonzero(nz & (cls == i))
        if sel_rows.size:
            sid = np.searchsorted(bounds, sel_rows, side="right") - 1
            per_slab = np.bincount(sid, minlength=S)
        cap = int(per_slab.max(initial=0))
        gran = _width_gran(w)
        cap = max(-(-max(cap, 1) // gran) * gran, gran)
        s_caps.append(cap)
    stream_cap = stream_capacity(worst_fl + widths[-1])
    # _class_windows builds the grouping key cls * (span_cap+1) + row in
    # int32 with cls <= len(widths)+1; guard the scale limit explicitly
    # rather than silently scrambling the class sort past it.
    assert (len(widths) + 2) * (span_cap + 1) < 2**31, (
        "seg pipeline int32 class-key overflow: slab row span too large "
        f"(span_cap={span_cap}, classes={len(widths)}) — raise num_slabs"
    )
    return dict(
        bounds=bounds,
        span_cap=int(span_cap),
        slab_nnz_cap=int(slab_nnz_cap),
        chunk_cap=int(chunk_cap),
        worst_fl=int(worst_fl),
        classes=tuple(widths),
        s_caps=tuple(s_caps),
        stream_cap=int(stream_cap),
        padded=int(sum(sc * w for sc, w in zip(s_caps, widths))),
    )


def _class_windows(colstream, valstream, rowfl, row_start, *,
                   classes: Tuple[int, ...], s_caps: Tuple[int, ...],
                   span_cap: int):
    """Group slab rows by size class and gather each class's per-row
    contiguous product windows from the stream.  ``classes`` are the
    half-octave window WIDTHS (:func:`_widths_upto`).  Returns a list of
    (col2d, val2d, rows_c, lens) per class, where col2d/val2d are the
    sentinel-padded (S_c, L) batches ready for a dim-1 sort."""
    R = span_cap + 1
    widths_dev = jnp.asarray(classes, jnp.int32)
    # class of each row = first width strictly greater than its flops
    cls = jnp.searchsorted(widths_dev, rowfl, side="right").astype(jnp.int32)
    ncls = len(classes)
    cls = jnp.where(rowfl > 0, cls, ncls + 1)  # empty rows -> sentinel
    key = cls * R + jnp.arange(R, dtype=jnp.int32)
    skey = jnp.sort(key)
    smax = max(s_caps)
    skey = jnp.concatenate(
        [skey, jnp.full((smax,), jnp.iinfo(jnp.int32).max, jnp.int32)]
    )
    thresholds = jnp.asarray(
        [i * R for i in range(ncls + 1)], jnp.int32
    )
    cstarts = jnp.searchsorted(skey[:R], thresholds).astype(jnp.int32)
    out = []
    for i, L in enumerate(classes):
        S_c = s_caps[i]
        seg = jax.lax.dynamic_slice(skey, (cstarts[i],), (S_c,))
        rows_c = seg % R
        n_c = cstarts[i + 1] - cstarts[i]
        live = jnp.arange(S_c, dtype=jnp.int32) < n_c
        rows_c = jnp.where(live, rows_c, span_cap)
        lens = jnp.where(live, rowfl[rows_c], 0)
        starts = jnp.where(live, row_start[rows_c], 0)
        col2d = jax.vmap(
            lambda s: jax.lax.dynamic_slice(colstream, (s,), (L,))
        )(starts)
        val2d = jax.vmap(
            lambda s: jax.lax.dynamic_slice(valstream, (s,), (L,))
        )(starts)
        j = jnp.arange(L, dtype=jnp.int32)[None, :]
        keep = j < lens[:, None]
        col2d = jnp.where(keep, col2d, _SENT)
        val2d = jnp.where(keep, val2d, 0)
        out.append((col2d, val2d, rows_c, lens))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("sr", "span_cap", "slab_nnz_cap", "chunk_cap",
                     "slab_out_cap", "stream_cap", "classes", "s_caps",
                     "interpret"),
)
def _seg_slab_digest_step(
    a: SpCOO,
    b: SpCOO,
    b_rp,
    b_tables,
    bounds,
    s,
    total_lo,
    total_hi,
    checksum,
    truncated,
    sr: Semiring,
    *,
    span_cap: int,
    slab_nnz_cap: int,
    chunk_cap: int,
    slab_out_cap: int,
    stream_cap: int,
    classes: Tuple[int, ...],
    s_caps: Tuple[int, ...],
    interpret: bool = False,
):
    """One slab of the segmented streamed digest: narrow expand with
    stride=0 (col-only keys), per-class batched within-row sorts, one
    single-key compress over the concatenated class buffers, digest fold.

    nnz accumulates as 16-bit-split int32 partials exactly as
    :func:`ops.spgemm._pallas_slab_digest_step` does (scale-22 totals
    exceed int32)."""
    from combblas_tpu.ops.pallas.compress_kernel import (
        compress_sorted_packed_pallas,
    )
    from combblas_tpu.ops.pallas.expand_kernel import (
        build_chunk_meta,
        expand_chunks_compact,
    )

    k = a.shape[1]
    sub, _row_lo = _slab_extract(a, k, bounds, s, span_cap=span_cap,
                                 slab_nnz_cap=slab_nnz_cap)
    meta, metaf, _, _fl = build_chunk_meta(
        sub.row, sub.col, sub.val, sub.mask(), b_rp[:-1], b_rp[1:], 0,
        chunk_cap,
    )
    bc2, bv2 = b_tables if b_tables is not None else _tables_2d(b)
    colstream, valstream, _total = expand_chunks_compact(
        meta, metaf, bc2, bv2, sr, stream_cap=stream_cap,
        interpret=interpret)
    rowfl, row_start = _row_flops_exact(sub, b_rp, span_cap)
    wins = _class_windows(colstream, valstream, rowfl, row_start,
                          classes=classes, s_caps=s_caps, span_cap=span_cap)
    parts_k, parts_v = [], []
    for (col2d, val2d, _rows, _lens) in wins:
        col2d, val2d = jax.lax.sort((col2d, val2d), dimension=1, num_keys=1)
        parts_k.append(col2d.reshape(-1))
        parts_v.append(val2d.reshape(-1))
    cat_k = jnp.concatenate(parts_k)
    cat_v = jnp.concatenate(parts_v)
    okey, oval, nnz = compress_sorted_packed_pallas(
        cat_k, cat_v, sr, out_capacity=slab_out_cap, interpret=interpret
    )
    live = jnp.arange(okey.shape[0], dtype=jnp.int32) < nnz
    cs = jnp.sum(jnp.where(live, oval.astype(jnp.float32), 0.0))
    return (total_lo + (nnz & 0xFFFF), total_hi + (nnz >> 16),
            checksum + cs, truncated | (nnz >= slab_out_cap))


def seg_prepare(a: SpCOO, b: SpCOO, num_slabs: int,
                slab_out_cap: int | None = None):
    """Hoistable per-(a, b) state for the segmented streamed digest: the
    host plan plus the slab-invariant device tables (B row-pointer map and
    padded B tables), exactly what the flat headline loop hoists.  Returns
    (plan, b_rp, b_tables, bounds_dev, slab_out_cap)."""
    plan = seg_plan(a, b, num_slabs)
    if slab_out_cap is None:
        slab_out_cap = round_capacity_frac(max(plan["worst_fl"], 2048))
    slab_out_cap = max(-(-slab_out_cap // 128) * 128, 2048)
    return (plan, b.row_ptr(), _tables_2d(b), jnp.asarray(plan["bounds"]),
            slab_out_cap)


def seg_step(a, b, prep, s, state, sr: Semiring = PLUS_TIMES, *,
             interpret: bool = False):
    """One slab step of the segmented digest on hoisted ``prep`` state."""
    plan, b_rp, b_tables, bounds_dev, slab_out_cap = prep
    return _seg_slab_digest_step(
        a, b, b_rp, b_tables, bounds_dev, jnp.asarray(s, jnp.int32),
        *state, sr,
        span_cap=plan["span_cap"], slab_nnz_cap=plan["slab_nnz_cap"],
        chunk_cap=plan["chunk_cap"], slab_out_cap=slab_out_cap,
        stream_cap=plan["stream_cap"], classes=plan["classes"],
        s_caps=plan["s_caps"], interpret=interpret,
    )


def seg_zero_state():
    return (
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0.0, jnp.float32),
        jnp.asarray(False),
    )


# ---------------------------------------------------------------------------
# seg2: sorted-row uniform-width slabs
# ---------------------------------------------------------------------------
#
# The class-batched pipeline above pays a max-over-slabs tax: every slab
# allocates (and sorts) every class at the largest count any slab needs —
# measured pad_ratio 1.62 at scale 22 vs the ~1.2 the half-octave ladder
# promises.  seg2 removes the tax with a workload transform the digest
# contract makes free: permuting A's rows permutes C's rows but changes
# neither nnz nor the value multiset, so sort A's rows by product count
# DESCENDING and slab the *sorted* order.  Every slab is then one
# homogeneous batch of windows of ONE width (the ladder width of its first
# = heaviest row), sized to its true count — no classes, no cross-slab max,
# and the per-slab step is simpler than the classed one.
#
# Reference counterpart: the hash-SpGEMM of ``mtSpGEMM.h:362-440`` is
# insensitive to row order; this transform buys the sort formulation the
# same insensitivity.


def _ladder_down(w: int) -> int:
    """Previous half-octave ladder value (window lower bound for one slab)."""
    c = _MIN_CLS
    prev = 1 << c
    while True:
        for cand in (1 << c, 3 << (c - 1)):
            if cand >= w:
                return prev
            prev = cand
        c += 1


def _frac_ladder(n: int, frac: int = 4) -> int:
    """Round up to the next 1/frac-pow2 ladder value (shape-count control)."""
    n = max(n, 1)
    step = max((1 << int(np.floor(np.log2(n)))) // frac, 1)
    return -(-n // step) * step


def _pow4_cap(n: int) -> int:
    """Round up to the next power of 4 (coarse cap for cheap dimensions)."""
    n = max(n, 256)
    p = 1
    while p < n:
        p <<= 2
    return p


def _spad_for(w: int, n_class: int, flops_cap: int, pad_cap: int) -> int:
    """Shared window count for width-``w`` slabs: fill a ~``flops_cap``
    sort area (so per-slab memory is budget-bound regardless of row
    weights), but never allocate more windows than the class has rows;
    gran-rounded so every class buffer is whole compress tiles."""
    gran = _width_gran(w)
    sp = max(min(flops_cap // w, pad_cap // w), 1)
    sp = min(sp, -(-n_class // gran) * gran)
    # NOTE: pad_cap is approximate, not a hard bound — the gran round-up
    # below can overshoot it by up to one compress tile (lcm(w, 32768)
    # elements, <= 128 KiB at f32) so class buffers stay whole tiles.
    # Callers sizing against VMEM/HBM should leave that much headroom.
    return max(-(-sp // gran) * gran, gran)


def _class_area(w: int, n_class: int, flops_cap: int, pad_cap: int) -> int:
    """Total allocated (padded) elements for a class of ``n_class`` rows at
    width ``w``: #slabs x shared-s_pad x w, including the partial tail
    slab's sentinel windows."""
    if n_class <= 0:
        return 0
    sp = _spad_for(w, n_class, flops_cap, pad_cap)
    return -(-n_class // sp) * sp * w


def _choose_widths(fl_desc: np.ndarray, cands: list[int], max_widths: int,
                   flops_cap: int, pad_cap: int) -> list[int]:
    """Pick <= ``max_widths`` window widths from ``cands`` minimizing total
    ALLOCATED sort area when every row is assigned the smallest selected
    width STRICTLY greater than its product count (the >= 1
    trailing-sentinel invariant).  The cost of covering a row range with
    one width is :func:`_class_area` — it charges the real shared-shape
    cost (slab quantization + gran rounding + partial tail), not just the
    intrinsic ladder padding.  Small DP, O(K C^2) with C ~ 100."""
    C = len(cands)
    req = np.searchsorted(cands, fl_desc, side="right")  # first cand > fl
    assert req.max(initial=0) < C, "candidate ladder does not cover max row"
    n = np.bincount(req, minlength=C)
    cum = np.cumsum(n)
    jmax = int(req.max(initial=0))
    K = max(min(max_widths, C), 1)
    INF = float("inf")
    f = [[INF] * C for _ in range(K + 1)]
    parent = [[-1] * C for _ in range(K + 1)]

    def seg_cost(ip, i):
        # bins (ip, i] served by width cands[i]; ip == -1 means from 0
        n_seg = int(cum[i] - (cum[ip] if ip >= 0 else 0))
        return float(_class_area(cands[i], n_seg, flops_cap, pad_cap))

    for i in range(C):
        f[1][i] = seg_cost(-1, i)
    for k in range(2, K + 1):
        for i in range(C):
            best, barg = f[k - 1][i], i  # reuse k-1 solution (skip a width)
            for ip in range(i):
                c = f[k - 1][ip] + seg_cost(ip, i)
                if c < best:
                    best, barg = c, ip
            f[k][i] = best
            parent[k][i] = barg
    i = min(range(jmax, C), key=lambda j: f[K][j])
    sel = []
    k = K
    while k >= 1 and i >= 0:
        if not sel or sel[-1] != cands[i]:
            sel.append(cands[i])
        ip = parent[k][i] if k > 1 else -1
        if ip == i:
            k -= 1
            continue
        i = ip
        k -= 1
    return sorted(set(sel))


def seg2_plan(a: SpCOO, b: SpCOO, *, flops_cap: int = 1 << 28,
              pad_cap: int = 1 << 28, flat_max_fl: int = 1 << 9,
              max_widths: int = 14):
    """Host plan for the sorted-row uniform-width pipeline.

    Builds ``a2`` — A with rows permuted by descending product count and
    zero-product rows/entries dropped — plus contiguous slab bounds over the
    sorted row order.  Each slab gets ONE window width ``w`` and a window
    count ``s_pad``; slabs cut when (i) the next row falls below the
    previous ladder width (pad bound), (ii) slab flops would exceed
    ``flops_cap`` (the stream/memory budget), or (iii) padded elements
    would exceed ``pad_cap``.  Rows with fewer than ``flat_max_fl``
    products skip the window machinery entirely and ride the flat wide-key
    digest step.

    Compiled-shape discipline (the warm-up tax dominates end-to-end wall
    time through a remote compile service — measured ~23 s per shape at
    scale 22): the width ladder is not fixed — ``_choose_widths`` picks
    <= ``max_widths`` widths from a quarter-octave candidate grid by a
    small DP minimizing total padded mass for THIS matrix's row-flops
    distribution, and a normalization pass then forces every slab of one
    width to share a single (s_pad, nnz_cap, chunk_cap) tuple and every
    flat slab to share one config.  Compiled shapes = selected widths + 1,
    vs 49 for the round-4 half-octave/per-slab-capacity plan at scale 22,
    at a measured padded-mass cost of a few percent.

    Returns (a2, cfg) where cfg carries bounds, per-slab static configs and
    the shared caps."""
    # every per-slab sort (window batch or flat stream) is bounded by the
    # slab budget; enforce XLA's stable-sort element limit here, not at
    # XLA-error time (VERDICT r4 item 7)
    check_sort_limit(flops_cap, "seg2 slab budget")
    m, k = a.shape
    nnz = int(a.nnz)
    b_rp = np.asarray(b.row_ptr()).astype(np.int64)
    arow = np.asarray(a.row)[:nnz]
    acol = np.minimum(np.asarray(a.col)[:nnz], k - 1)
    aval = np.asarray(a.val)[:nnz]
    cnt_e = b_rp[acol + 1] - b_rp[acol]
    rowfl = np.bincount(arow, weights=cnt_e, minlength=m).astype(np.int64)
    live_rows = np.flatnonzero(rowfl > 0)
    order = live_rows[np.argsort(-rowfl[live_rows], kind="stable")]
    R = len(order)
    fl = rowfl[order]  # descending
    newid = np.full(m, -1, np.int64)
    newid[order] = np.arange(R)
    keep = cnt_e > 0
    new_r = newid[arow[keep]].astype(np.int32)
    new_c = acol[keep].astype(np.int32)
    new_v = aval[keep]
    og = np.lexsort((new_c, new_r))
    new_r, new_c, new_v = new_r[og], new_c[og], new_v[og]
    a2 = SpCOO.from_arrays(new_r, new_c, new_v, (m, k),
                           sum_duplicates=False, dtype=a.val.dtype)
    # per-sorted-row entry counts (for per-slab nnz caps)
    epr = np.bincount(new_r, minlength=R).astype(np.int64)
    epr_cum = np.concatenate([[0], np.cumsum(epr)])
    fl_cum = np.concatenate([[0], np.cumsum(fl)])

    min_w = 1 << _MIN_CLS
    # matrix-adaptive width ladder over the heavy (windowed) rows
    heavy = fl[fl >= flat_max_fl]
    n_heavy = int(heavy.size)
    if n_heavy:
        cands, c = [], min_w
        top = int(heavy[0])
        while c <= top:
            cands.extend(c * mlt // 4 for mlt in (4, 5, 6, 7))
            c <<= 1
        cands.append(c)
        cands = sorted({x for x in cands if x >= min_w})
        sel_w = np.asarray(
            _choose_widths(heavy, cands, max_widths, flops_cap, pad_cap),
            np.int64)
        # per-width shared window count, from the FULL class population
        req = np.searchsorted(sel_w, heavy, side="right")
        class_n = np.bincount(req, minlength=len(sel_w))
        spad_w = {int(sel_w[i]): _spad_for(int(sel_w[i]), int(class_n[i]),
                                           flops_cap, pad_cap)
                  for i in range(len(sel_w)) if class_n[i] > 0}
    else:
        sel_w = np.asarray([min_w], np.int64)
        spad_w = {}

    bounds = [0]
    slabs = []
    r = 0
    while r < R:
        f0 = int(fl[r])
        # small rows skip the window machinery: window overhead (~4 us per
        # window for gather slices + rowfl maps) dwarfs their few products,
        # and the flat wide-key sort on their short streams is cheap —
        # route every row below flat_max_fl through the flat digest step
        flat = f0 < flat_max_fl
        if flat:
            w = min_w
            # flat slab: every remaining row, cut by the flops budget.
            # TPU HBM bounds for the wide-key digest step (measured at
            # scale 24 on 16 G v5e): (a) stream temps — a 2^28-element
            # stream compiles to a 19.0 G program, so clamp flat flops at
            # 2^27; (b) the (chunk_cap, 8) s32 chunk table pads 16x to the
            # 128-lane tile (chunk_cap 2^24 alone = two 8.0 G HLO temps),
            # so also cut by chunk count to stay in the 2^22 pow4 class
            # (2 G padded each — scale 22's working configuration).
            flat_cap = min(flops_cap, 1 << 27)
            lim_flops = int(
                np.searchsorted(fl_cum, fl_cum[r] + flat_cap, side="right")
                - 1 - r)
            comb = epr_cum + -(-fl_cum // 128)  # ~ nnz + chunks(flops)
            lim_chunk = int(
                np.searchsorted(comb, comb[r] + ((1 << 22) - 2),
                                side="right") - 1 - r)
            lim_flops = max(min(lim_flops, lim_chunk), 1)
            cnt = max(min(lim_flops, R - r), 1)
            s_pad = cnt
        else:
            wi = int(np.searchsorted(sel_w, f0, side="right"))
            w = int(sel_w[wi])  # smallest selected width strictly > f0
            # rows down to the previous selected width share the class
            w_low = int(sel_w[wi - 1]) if wi > 0 else flat_max_fl
            lim_class = int(np.searchsorted(-fl, -w_low, side="right") - r)
            # fixed-count cut: every slab of this width takes s_pad rows
            # (the shared sort area is ~flops_cap by construction, so the
            # memory budget holds without a per-slab flops bound); only
            # the class tail is partial
            s_pad = spad_w[w]
            cnt = max(min(s_pad, lim_class), 1)
        nnz_s = int(epr_cum[r + cnt] - epr_cum[r])
        fl_s = int(fl_cum[r + cnt] - fl_cum[r])
        # chunk bound: one chunk per entry + one per CH products
        ch_s = nnz_s + -(-fl_s // 128)
        slabs.append(dict(
            w=int(w), s_pad=int(s_pad), cnt=int(cnt),
            nnz_cap=_pow4_cap(nnz_s), chunk_cap=_pow4_cap(ch_s),
            flops=fl_s, padded=fl_s if flat else int(s_pad) * int(w),
            flat=flat,
            flat_stream_cap=(max(-(-(fl_s + 18 * 128) // 32768) * 32768,
                                 32768) if flat else 0),
        ))
        r += cnt
        bounds.append(r)
    # ---- shape-sharing normalization: one compiled shape per width ----
    # (s_pad is already shared per width; share the cheap caps too)
    by_shape = {}
    for sl in slabs:
        by_shape.setdefault(("flat",) if sl["flat"] else (sl["w"],),
                            []).append(sl)
    for key, group in by_shape.items():
        nnz_cap = max(sl["nnz_cap"] for sl in group)
        chunk_cap = max(sl["chunk_cap"] for sl in group)
        fsc = max(sl["flat_stream_cap"] for sl in group)
        s_pad = max(sl["s_pad"] for sl in group)
        for sl in group:
            sl["s_pad"] = int(s_pad)
            sl["nnz_cap"], sl["chunk_cap"] = int(nnz_cap), int(chunk_cap)
            sl["flat_stream_cap"] = int(fsc)
            if not sl["flat"]:
                sl["padded"] = int(s_pad) * int(sl["w"])
    worst_fl = max(s["flops"] for s in slabs)
    stream_cap = stream_capacity(worst_fl + max(s["w"] for s in slabs))
    padded_total = sum(s["padded"] for s in slabs)
    flops_total = int(fl_cum[-1])
    shapes = sorted({(s["w"], s["s_pad"], s["nnz_cap"], s["chunk_cap"],
                      s["flat"], s["flat_stream_cap"])
                     for s in slabs})
    cfg = dict(
        bounds=np.asarray(bounds, np.int32), slabs=slabs,
        stream_cap=int(stream_cap), worst_fl=int(worst_fl),
        padded=int(padded_total), flops=flops_total,
        pad_ratio=padded_total / max(flops_total, 1), shapes=shapes,
    )
    return a2, cfg


@functools.partial(
    jax.jit,
    static_argnames=("sr", "w", "s_pad", "nnz_cap", "chunk_cap",
                     "stream_cap", "slab_out_cap", "interpret"),
)
def _seg2_slab_digest_step(
    a2: SpCOO,
    b: SpCOO,
    b_rp,
    b_tables,
    bounds,
    s,
    cnt,
    total_lo,
    total_hi,
    checksum,
    truncated,
    sr: Semiring,
    *,
    w: int,
    s_pad: int,
    nnz_cap: int,
    chunk_cap: int,
    stream_cap: int,
    slab_out_cap: int,
    interpret: bool = False,
):
    """One sorted-row uniform-width slab: narrow expand (stride=0, col-only
    keys), ONE (s_pad, w) batched within-row sort, one single-key compress,
    digest fold.  All ``cnt`` live windows are contiguous local rows
    [0, cnt); ``s_pad - cnt`` trailing windows are all-sentinel."""
    from combblas_tpu.ops.pallas.compress_kernel import (
        compress_sorted_packed_pallas,
    )
    from combblas_tpu.ops.pallas.expand_kernel import (
        build_chunk_meta,
        expand_chunks_compact,
    )

    k = a2.shape[1]
    sub, _row_lo = _slab_extract(a2, k, bounds, s, span_cap=s_pad,
                                 slab_nnz_cap=nnz_cap)
    meta, metaf, _, _fl = build_chunk_meta(
        sub.row, sub.col, sub.val, sub.mask(), b_rp[:-1], b_rp[1:], 0,
        chunk_cap,
    )
    bc2, bv2 = b_tables if b_tables is not None else _tables_2d(b)
    colstream, valstream, _total = expand_chunks_compact(
        meta, metaf, bc2, bv2, sr, stream_cap=stream_cap,
        interpret=interpret)
    rowfl, row_start = _row_flops_exact(sub, b_rp, s_pad)
    i = jnp.arange(s_pad, dtype=jnp.int32)
    live = i < cnt
    lens = jnp.where(live, rowfl[:s_pad], 0)
    starts = jnp.where(live, row_start[:s_pad], 0)
    col2d = jax.vmap(
        lambda st: jax.lax.dynamic_slice(colstream, (st,), (w,))
    )(starts)
    val2d = jax.vmap(
        lambda st: jax.lax.dynamic_slice(valstream, (st,), (w,))
    )(starts)
    j = jnp.arange(w, dtype=jnp.int32)[None, :]
    keep = j < lens[:, None]
    col2d = jnp.where(keep, col2d, _SENT)
    val2d = jnp.where(keep, val2d, 0)
    col2d, val2d = jax.lax.sort((col2d, val2d), dimension=1, num_keys=1)
    okey, oval, nnz = compress_sorted_packed_pallas(
        col2d.reshape(-1), val2d.reshape(-1), sr,
        out_capacity=slab_out_cap, interpret=interpret,
    )
    live_o = jnp.arange(okey.shape[0], dtype=jnp.int32) < nnz
    cs = jnp.sum(jnp.where(live_o, oval.astype(jnp.float32), 0.0))
    return (total_lo + (nnz & 0xFFFF), total_hi + (nnz >> 16),
            checksum + cs, truncated | (nnz >= slab_out_cap))


def seg2_prepare(a: SpCOO, b: SpCOO, *, flops_cap: int = 1 << 28,
                 pad_cap: int = 1 << 28, slab_out_cap: int | None = None,
                 max_widths: int = 14):
    """Hoistable state for the sorted-row uniform-width digest pipeline:
    (a2, cfg, b_rp, b_tables, bounds_dev, slab_out_cap).

    ``max_widths`` trades compiled shapes for padding: at scale 22 the DP
    ladder measures pad 1.47 with 15 shapes (14 widths), 1.36 with 21
    shapes (20), 1.27 with 29 shapes (28).  Callers that amortize compiles
    across runs (persistent cache) should raise it; a cold one-shot run
    keeps the default."""
    a2, cfg = seg2_plan(a, b, flops_cap=flops_cap, pad_cap=pad_cap,
                        max_widths=max_widths)
    if slab_out_cap is None:
        slab_out_cap = round_capacity_frac(max(cfg["worst_fl"], 2048))
    slab_out_cap = max(-(-slab_out_cap // 128) * 128, 2048)
    return (a2, cfg, b.row_ptr(), _tables_2d(b),
            jnp.asarray(cfg["bounds"]), slab_out_cap)


def seg2_step(b, prep, s, state, sr: Semiring = PLUS_TIMES, *,
              interpret: bool = False):
    """One slab step on hoisted ``prep`` state (host loop drives ``s``)."""
    from combblas_tpu.ops.spgemm import _pallas_slab_digest_step

    a2, cfg, b_rp, b_tables, bounds_dev, slab_out_cap = prep
    sl = cfg["slabs"][s]
    if sl.get("flat"):
        return _pallas_slab_digest_step(
            a2, b, b_rp, b_tables, bounds_dev, jnp.asarray(s, jnp.int32),
            *state, sr,
            span_cap=sl["s_pad"], slab_nnz_cap=sl["nnz_cap"],
            chunk_cap=sl["chunk_cap"], slab_out_cap=slab_out_cap,
            stream_cap=sl["flat_stream_cap"], wide=True,
            interpret=interpret,
        )
    return _seg2_slab_digest_step(
        a2, b, b_rp, b_tables, bounds_dev, jnp.asarray(s, jnp.int32),
        jnp.asarray(sl["cnt"], jnp.int32), *state, sr,
        w=sl["w"], s_pad=sl["s_pad"], nnz_cap=sl["nnz_cap"],
        chunk_cap=sl["chunk_cap"], stream_cap=cfg["stream_cap"],
        slab_out_cap=slab_out_cap, interpret=interpret,
    )


def spgemm_streamed_seg2(
    a: SpCOO,
    b: SpCOO,
    sr: Semiring = PLUS_TIMES,
    *,
    flops_cap: int = 1 << 28,
    pad_cap: int = 1 << 28,
    slab_out_cap: int | None = None,
    max_widths: int = 14,
    interpret: bool = False,
):
    """Slab-streamed digest SpGEMM via the sorted-row uniform-width
    pipeline.  Same contract as :func:`spgemm_streamed_seg` — every product
    formed, every duplicate merged, per-slab digest fold — but C's rows are
    visited in descending-flops order (digest is row-permutation
    invariant).  Returns (nnz_total, checksum, truncated)."""
    prep = seg2_prepare(a, b, flops_cap=flops_cap, pad_cap=pad_cap,
                        slab_out_cap=slab_out_cap, max_widths=max_widths)
    state = seg_zero_state()
    for s in range(len(prep[1]["slabs"])):
        state = seg2_step(b, prep, s, state, sr, interpret=interpret)
    total_lo, total_hi, checksum, truncated = state
    total = int(total_lo) + (int(total_hi) << 16)
    return total, checksum, truncated


def spgemm_streamed_seg(
    a: SpCOO,
    b: SpCOO,
    sr: Semiring = PLUS_TIMES,
    *,
    num_slabs: int,
    slab_out_cap: int | None = None,
    interpret: bool = False,
):
    """Slab-streamed digest SpGEMM via the segmented pipeline.  Same
    contract as :func:`ops.spgemm.spgemm_pallas_streamed`: every slab's C
    block is fully formed, merged and compacted on device, folded into
    (nnz, checksum), and released.  Returns (nnz_total, checksum,
    truncated)."""
    prep = seg_prepare(a, b, num_slabs, slab_out_cap)
    S = len(prep[0]["bounds"]) - 1
    state = seg_zero_state()
    for s in range(S):
        state = seg_step(a, b, prep, s, state, sr, interpret=interpret)
    total_lo, total_hi, checksum, truncated = state
    total = int(total_lo) + (int(total_hi) << 16)
    return total, checksum, truncated
