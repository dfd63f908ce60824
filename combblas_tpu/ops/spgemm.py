"""Local (single-block) semiring SpGEMM: C = A ·_sr B.

TPU-native replacement for the reference's per-process multiply kernels
(``mtSpGEMM.h:214`` LocalHybridSpGEMM — per-column heap/hash accumulation under
OpenMP) and its symbolic estimators (``estimateFLOP`` ``mtSpGEMM.h:1058``,
``estimateNNZ_Hash`` ``:807``).  Heaps and hash tables are scalar-serial and map
terribly onto a vector machine, so the design here is the ESC scheme
(expand -> sort -> compress), which is bandwidth-bound and fully VPU-parallel:

1. *expand*: every product a_ik * b_kj becomes one slot of a flat buffer; the
   slot -> (A-nonzero, B-offset) mapping forward-fills per-run A-side fields
   with delta-scatter + int32 cumsum (exact by modular telescoping), leaving
   only the per-slot B gather — random gather is the one op XLA-on-TPU runs
   slowly (~116M lookups/s measured), so the design minimizes gathers, never
   uses searchsorted, and never materializes multi-column gather outputs.
2. *sort*: one multi-key ``lax.sort`` by (i, j) — int32 keys, no packing.
3. *compress*: flag + prefix-sum + segment reduction with the semiring's add
   (see :func:`combblas_tpu.ops.coo.compress_sorted`).

Buffer capacities are static (jit) and chosen by the host-side symbolic helpers
below — the analogue of the reference's estimate-then-allocate protocol.
For large problems :func:`spgemm_rowchunked` processes disjoint row slabs of A
sequentially (``lax.map``), bounding peak memory the same way the reference's
memory-constrained path splits work (``ParFriends.h:450`` MemEfficientSpGEMM
splits B's columns; row slabs of A are the better fit here because slabs produce
disjoint output rows — no cross-slab merge is ever needed).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from combblas_tpu.ops.coo import (
    SpCOO,
    compress_sorted,
    sort_compress,
    sort_compress_packed,
)
from combblas_tpu.semiring import PLUS_TIMES, Semiring

__all__ = [
    "spgemm",
    "spgemm_flops",
    "spgemm_bounds",
    "spgemm_rowchunked",
    "spgemm_dense",
    "spgemm_pallas",
    "spgemm_pallas_bounds",
    "spgemm_pallas_rowchunked",
    "spgemm_pallas_wide",
    "spgemm_pallas_streamed",
]


def expand_products(
    a_row: jax.Array,
    a_col: jax.Array,
    a_val: jax.Array,
    a_valid: jax.Array,
    b_col: jax.Array,
    b_val: jax.Array,
    rp_lo: jax.Array,
    rp_hi: jax.Array,
    sr: Semiring,
    flops_cap: int,
    out_sentinels: Tuple[int, int],
):
    """Expansion phase on raw arrays: materialize all products (i, j, v).

    ``rp_lo/rp_hi`` give, per inner index k, the [start, end) range of B's
    entries for row k inside the ``b_col/b_val`` buffers — for a plain SpCOO
    these are row_ptr[:-1] / row_ptr[1:], but SUMMA passes ranges into a
    *concatenated multi-block panel* (see parallel/summa.py), which is why the
    two arrays are separate.  Returns sentinel-padded (i, j, v) of length
    ``flops_cap`` plus the traced count of valid products.
    """
    m_sent, n_sent = out_sentinels
    kk = rp_lo.shape[0]
    cap_b = b_col.shape[0]
    acol = jnp.minimum(a_col, kk - 1)
    cnt = jnp.where(a_valid, rp_hi[acol] - rp_lo[acol], 0)
    offs = jnp.cumsum(cnt)  # inclusive prefix
    total = offs[-1]
    starts = offs - cnt
    t = jnp.arange(flops_cap, dtype=jnp.int32)
    # Per-slot A-side metadata WITHOUT any per-slot gather (XLA random gather
    # measures ~116M lookups/s on this chip — 30x slower than a scan pass):
    # every A-side field is forward-filled across its run by the
    # delta-scatter + cumsum trick: scatter (payload - previous producing
    # payload) at each run start (starts are strictly increasing over
    # producing nonzeros, so positions are unique), then an int32 cumsum
    # telescopes to the payload value everywhere in the run.  Wraparound is
    # harmless — modular telescoping is exact — so float payloads ride their
    # raw bits (bitcast), making the fill EXACT for any 32-bit field.  No
    # monotonicity of a_row is assumed (SUMMA panels concatenate blocks whose
    # row ids restart).
    has = cnt > 0
    pos = jnp.where(has, starts, flops_cap)  # dropped when out of range
    valid = t < total
    cap_a = a_row.shape[0]
    rank = jnp.cumsum(has.astype(jnp.int32)) - 1  # rank among producing nnz
    r_sc = jnp.where(has, rank, cap_a)

    def _fill(payload_int):
        compact = jnp.zeros((cap_a,), jnp.int32).at[r_sc].set(
            payload_int, mode="drop"
        )
        prev = compact[jnp.maximum(rank - 1, 0)]
        delta = jnp.where(rank > 0, payload_int - prev, payload_int)
        seeded = jnp.zeros((flops_cap,), jnp.int32).at[pos].set(
            delta, mode="drop"
        )
        return jnp.cumsum(seeded)

    # b_idx = b_start + (t - run_start) = t + shift; bias keeps shift >= 0.
    shift = rp_lo[acol] - starts + flops_cap
    i = _fill(a_row)
    shift_f = _fill(shift)
    a_val_f = jax.lax.bitcast_convert_type(
        _fill(jax.lax.bitcast_convert_type(a_val.astype(jnp.float32),
                                           jnp.int32)),
        jnp.float32,
    ).astype(a_val.dtype) if jnp.issubdtype(a_val.dtype, jnp.floating) else \
        _fill(a_val.astype(jnp.int32)).astype(a_val.dtype)
    b_idx = jnp.minimum(t + shift_f - flops_cap, cap_b - 1)
    b_idx = jnp.maximum(b_idx, 0)
    # The one unavoidable random access (B's column id and value per product)
    # as two 1-wide gathers.  Wide (N, k) gathers are NOT used: gather cost on
    # TPU is per-index (not per-byte), and a materialized (N, 2) f32 output
    # tiles to T(8, 128) — a 64x HBM padding blowup.
    j = jnp.where(valid, b_col[b_idx], n_sent)
    bv = b_val[b_idx]
    i = jnp.where(valid, i, m_sent)
    v = jnp.where(valid, sr.mul(a_val_f, bv), 0)
    return i, j, v, total




def _expand(a: SpCOO, b: SpCOO, b_rp: jax.Array, sr: Semiring, flops_cap: int):
    """Expansion for whole local operands (see :func:`expand_products`)."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, (a.shape, b.shape)
    return expand_products(
        a.row,
        a.col,
        a.val,
        a.mask(),
        b.col,
        b.val,
        b_rp[:-1],
        b_rp[1:],
        sr,
        flops_cap,
        (m, n),
    )


@functools.partial(jax.jit, static_argnames=("sr", "flops_cap", "out_capacity"))
def spgemm(
    a: SpCOO,
    b: SpCOO,
    sr: Semiring = PLUS_TIMES,
    *,
    flops_cap: int,
    out_capacity: int,
) -> SpCOO:
    """Single-pass ESC SpGEMM.  ``flops_cap`` must bound the true product count
    (see :func:`spgemm_bounds`); producing more than ``flops_cap`` products is
    silently truncated, so callers use the host-side bound helpers.
    """
    check_sort_limit(flops_cap, "ESC expansion sort")
    b_rp = b.row_ptr()
    i, j, v, total = _expand(a, b, b_rp, sr, flops_cap)
    return sort_compress(
        i, j, v, total, (a.shape[0], b.shape[1]), sr=sr, out_capacity=out_capacity
    )


@jax.jit
def _flops_partials(a: SpCOO, b: SpCOO):
    """Per-group (lo, hi) limb partial sums of the per-nonzero product counts.

    int32 alone wraps once total flops pass 2^31 (true from R-MAT scale ~18
    up), and the TPU has no native int64 — so counts are split into 16-bit
    limbs, summed per 2^14-element group (each partial provably < 2^31), and
    the handful of partials are combined exactly on the host in int64."""
    k = a.shape[1]
    b_rp = b.row_ptr()
    acol = jnp.minimum(a.col, k)
    cnt = jnp.where(a.mask(), b_rp[acol + 1] - b_rp[acol], 0)
    g = 1 << 14
    pad = (-cnt.shape[0]) % g
    cnt = jnp.concatenate([cnt, jnp.zeros((pad,), cnt.dtype)]).reshape(-1, g)
    lo = jnp.sum(cnt & 0xFFFF, axis=1)  # <= 2^14 * 2^16 = 2^30
    hi = jnp.sum(cnt >> 16, axis=1)     # <= 2^14 * 2^15 = 2^29
    return lo, hi


def spgemm_flops(a: SpCOO, b: SpCOO) -> int:
    """Exact number of semiring multiplications for A·B (the reference's
    ``EstimateFLOP``, ``ParFriends.h:356`` / ``mtSpGEMM.h:1058``).  Host-side
    exact int (immune to int32 wraparound at scale >= 18)."""
    lo, hi = _flops_partials(a, b)
    return int(
        np.asarray(lo).astype(np.int64).sum()
        + (np.asarray(hi).astype(np.int64).sum() << 16)
    )


def round_capacity_frac(n: int, frac: int = 8) -> int:
    """Round up to the next 1/frac-of-a-power-of-two step: keeps compile-cache
    reuse high while wasting at most ~1/frac of buffer work (plain pow2
    rounding wastes up to 2x, which is pure streamed overhead in ESC)."""
    n = max(n, 8)
    step = max((1 << int(np.floor(np.log2(n)))) // frac, 8)
    return -(-n // step) * step


def spgemm_bounds(a: SpCOO, b: SpCOO) -> Tuple[int, int]:
    """Host-side (flops_cap, out_capacity) for :func:`spgemm`.

    Pulls the exact FLOP count to host once (cheap scalar transfer); buffers
    round to 1/8-pow2 steps (see :func:`round_capacity_frac`).
    out_capacity <= flops since compression only shrinks.
    """
    flops = int(spgemm_flops(a, b))
    cap = round_capacity_frac(flops)
    return cap, cap


def _slab_bounds_host(a: SpCOO, b: SpCOO, num_slabs: int) -> Tuple[int, int]:
    """Max per-slab flops over row slabs of A (host side)."""
    m = a.shape[0]
    slab_rows = -(-m // num_slabs)
    a_rp = np.asarray(a.row_ptr())
    b_rp = np.asarray(b.row_ptr())
    acol = np.minimum(np.asarray(a.col), a.shape[1] - 1)
    cnt = np.where(
        np.asarray(a.mask()), b_rp[acol + 1] - b_rp[acol], 0
    ).astype(np.int64)
    coffs = np.concatenate([[0], np.cumsum(cnt)])
    worst = 0
    for s in range(num_slabs):
        lo = a_rp[min(s * slab_rows, m)]
        hi = a_rp[min((s + 1) * slab_rows, m)]
        worst = max(worst, int(coffs[hi] - coffs[lo]))
    cap = max(8, 1 << int(np.ceil(np.log2(max(worst, 1)))))
    return cap, slab_rows


@functools.partial(
    jax.jit,
    static_argnames=("sr", "num_slabs", "slab_rows", "flops_cap", "out_capacity"),
)
def spgemm_rowchunked(
    a: SpCOO,
    b: SpCOO,
    sr: Semiring = PLUS_TIMES,
    *,
    num_slabs: int,
    slab_rows: int,
    flops_cap: int,
    out_capacity: int,
) -> SpCOO:
    """Memory-bounded ESC SpGEMM over disjoint row slabs of A.

    Each slab s multiplies A[s*slab_rows:(s+1)*slab_rows, :] by B with a
    per-slab expansion buffer of ``flops_cap`` slots.  Because slabs own
    disjoint output rows and run in increasing row order, the concatenated
    slab outputs are already globally (row, col)-sorted except for interleaved
    padding — the final compaction is a single sentinel-dropping scatter, not a
    sort.  Peak memory ~ flops_cap instead of total FLOPs.
    """
    m, k = a.shape
    n = b.shape[1]
    b_rp = b.row_ptr()
    a_rp = a.row_ptr()
    # per-slab nnz <= per-slab products <= flops_cap, so slab compression can
    # never truncate; only the global buffer can (detected by the caller)
    slab_out_cap = flops_cap

    def do_slab(s):
        lo = a_rp[jnp.minimum(s * slab_rows, m)]
        hi = a_rp[jnp.minimum((s + 1) * slab_rows, m)]
        # Gather A's nnz range [lo, hi) to the front of a cap-sized window.
        t = jnp.arange(a.capacity, dtype=jnp.int32)
        src = jnp.minimum(lo + t, a.capacity - 1)
        sub = SpCOO(
            row=a.row[src],
            col=a.col[src],
            val=a.val[src],
            nnz=(hi - lo).astype(jnp.int32),
            shape=a.shape,
        )
        i, j, v, total = _expand(sub, b, b_rp, sr, flops_cap)
        c = sort_compress(i, j, v, total, (m, n), sr=sr, out_capacity=slab_out_cap)
        return c.row, c.col, c.val, c.nnz

    rows, cols, vals, nnzs = jax.lax.map(
        do_slab, jnp.arange(num_slabs, dtype=jnp.int32)
    )
    # Compact: slab s's entries go to positions [prefix[s], prefix[s] + nnz[s]).
    prefix = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nnzs).astype(jnp.int32)]
    )
    total_nnz = jnp.minimum(prefix[-1], out_capacity)  # clamp: see spgemm_auto
    pos_in = jnp.broadcast_to(
        jnp.arange(slab_out_cap, dtype=jnp.int32)[None, :], (num_slabs, slab_out_cap)
    )
    dest = prefix[:-1][:, None] + pos_in
    valid = pos_in < nnzs[:, None]
    dest = jnp.where(valid, dest, out_capacity)  # dropped by scatter mode
    out_row = jnp.full((out_capacity,), m, jnp.int32).at[dest.ravel()].set(
        rows.ravel(), mode="drop"
    )
    out_col = jnp.full((out_capacity,), n, jnp.int32).at[dest.ravel()].set(
        cols.ravel(), mode="drop"
    )
    out_val = jnp.zeros((out_capacity,), vals.dtype).at[dest.ravel()].set(
        vals.ravel(), mode="drop"
    )
    return SpCOO(
        row=out_row,
        col=out_col,
        val=out_val,
        nnz=total_nnz.astype(jnp.int32),
        shape=(m, n),
    )


@functools.partial(jax.jit, static_argnames=("sr", "out_capacity"))
def spgemm_dense(
    a: SpCOO, b: SpCOO, sr: Semiring = PLUS_TIMES, *, out_capacity: int
) -> SpCOO:
    """Dense-fallback SpGEMM: densify blocks, multiply on the MXU, re-sparsify.

    The TPU-native answer for blocks above ~0.5-1% density, where the MXU's
    raw FLOP rate beats any sparse formulation despite the wasted zeros — the
    role the reference's per-column heap plays for dense-ish columns
    (``mtSpGEMM.h:311``), re-cast for a systolic array.  plus_times rides
    ``jnp.dot``; min/max-plus/times use blocked dense reductions.  Semantics
    note: products that cancel to exact 0 are dropped on re-sparsify (the
    numeric-ring convention), unlike the ESC path which keeps them — known
    structural divergence, use ESC when exact structure matters.
    """
    m, k = a.shape
    k2, n = b.shape
    assert k == k2
    ad = a.to_dense()
    bd = b.to_dense()
    if sr.name == "plus_times":
        cd = jnp.dot(ad, bd, preferred_element_type=jnp.float32)
    elif sr.name == "or_and":
        cd = (
            jnp.dot(
                (ad != 0).astype(jnp.float32),
                (bd != 0).astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            > 0
        ).astype(a.val.dtype)
    else:
        # generic semiring: blocked k-reduction; mask empty cells with identity
        zero = sr.zero(jnp.result_type(ad.dtype, bd.dtype))
        am = ad != 0
        bm = bd != 0
        # broadcast formulation in k-chunks to bound memory
        CHUNK = max(1, min(k, 512))
        nchunks = -(-k // CHUNK)
        init = jnp.full((m, n), zero, jnp.result_type(ad.dtype, bd.dtype))

        def body(c, acc):
            lo = c * CHUNK
            aa = jax.lax.dynamic_slice(ad, (0, lo), (m, CHUNK))
            ma = jax.lax.dynamic_slice(am, (0, lo), (m, CHUNK))
            bb = jax.lax.dynamic_slice(bd, (lo, 0), (CHUNK, n))
            mb2 = jax.lax.dynamic_slice(bm, (lo, 0), (CHUNK, n))
            prod = sr.mul(aa[:, :, None], bb[None, :, :])  # (m, CHUNK, n)
            mask = ma[:, :, None] & mb2[None, :, :]
            prod = jnp.where(mask, prod, zero)
            if sr.add_kind == "sum":
                contrib = jnp.sum(prod, axis=1)
                return acc + contrib
            if sr.add_kind == "min":
                return jnp.minimum(acc, jnp.min(prod, axis=1))
            return jnp.maximum(acc, jnp.max(prod, axis=1))

        cd = jax.lax.fori_loop(0, nchunks, body, init)
        cd = jnp.where(cd == zero, 0, cd)
    # re-sparsify: compact nonzero cells into a canonical SpCOO
    flat = cd.ravel()
    nz = flat != 0
    dest = jnp.cumsum(nz.astype(jnp.int32)) - 1
    nnz = jnp.maximum(dest[-1] + 1, 0)
    dest = jnp.where(nz, dest, out_capacity)
    lin = jnp.arange(m * n, dtype=jnp.int32)
    out_row = jnp.full((out_capacity,), m, jnp.int32).at[dest].set(
        lin // n, mode="drop"
    )
    out_col = jnp.full((out_capacity,), n, jnp.int32).at[dest].set(
        lin % n, mode="drop"
    )
    out_val = jnp.zeros((out_capacity,), cd.dtype).at[dest].set(flat, mode="drop")
    return SpCOO(row=out_row, col=out_col, val=out_val,
                 nnz=nnz.astype(jnp.int32), shape=(m, n))


@jax.jit
def _chunk_count(a: SpCOO, b: SpCOO) -> jax.Array:
    """Number of <=128-element expansion chunks for the Pallas kernel."""
    from combblas_tpu.ops.pallas.expand_kernel import CH

    k = a.shape[1]
    b_rp = b.row_ptr()
    acol = jnp.minimum(a.col, k)
    cnt = jnp.where(a.mask(), b_rp[acol + 1] - b_rp[acol], 0)
    return jnp.sum(-(-cnt // CH))


def spgemm_pallas_bounds(a: SpCOO, b: SpCOO) -> Tuple[int, int]:
    """Host-side (chunk_cap, out_capacity) for :func:`spgemm_pallas`.

    chunk_cap is a multiple of 256 so the chunk-padded stream
    (chunk_cap * 128) tiles evenly into the compress kernel's 32768-element
    tiles."""
    nch = int(_chunk_count(a, b))
    chunk_cap = max(-(-round_capacity_frac(max(nch, 256)) // 256) * 256, 256)
    flops = int(spgemm_flops(a, b))
    return chunk_cap, round_capacity_frac(flops)


def _tables_2d(b: SpCOO):
    """B's col/val buffers as (rows+1, 128) tables (one trailing pad row —
    every chunk DMA reads two consecutive rows)."""
    from combblas_tpu.ops.pallas.expand_kernel import CH

    n = b.shape[1]
    cap_b = b.col.shape[0]
    rows = -(-cap_b // CH)
    pad = rows * CH - cap_b + CH
    bc = jnp.concatenate(
        [b.col, jnp.full((pad,), n, jnp.int32)]).reshape(rows + 1, CH)
    bv = jnp.concatenate(
        [b.val, jnp.zeros((pad,), b.val.dtype)]).reshape(rows + 1, CH)
    return bc, bv


def stream_capacity(flops: int) -> int:
    """Compacted expansion stream capacity for ``flops`` products: staging
    slack + rounding to the compress kernel's 32768-element tiles."""
    need = flops + 17 * 128
    return max(-(-need // 32768) * 32768, 32768)


@functools.partial(
    jax.jit,
    static_argnames=("sr", "chunk_cap", "out_capacity", "stream_cap",
                     "interpret"),
)
def spgemm_pallas(
    a: SpCOO,
    b: SpCOO,
    sr: Semiring = PLUS_TIMES,
    *,
    chunk_cap: int,
    out_capacity: int,
    stream_cap: int | None = None,
    interpret: bool = False,
    b_rp: jax.Array | None = None,
    b_tables=None,
) -> SpCOO:
    """ESC SpGEMM with the Pallas segment-DMA expansion kernel
    (:mod:`combblas_tpu.ops.pallas.expand_kernel`) — the TPU-native
    counterpart of the reference's pointer-walking local multiply
    (``mtSpGEMM.h:214``).  Requires (m+1)*(n+1) < 2^31 (packed keys) and
    float32 values; callers fall back to :func:`spgemm` otherwise.

    With ``stream_cap`` (from :func:`stream_capacity` on the true flop
    count) the compacted-output expansion runs and the sort processes
    exactly-flops elements; without it, the chunk-padded stream (~1.3-1.7x
    on R-MAT) is sorted with sentinel-keyed pads."""
    from combblas_tpu.ops.pallas.compress_kernel import (
        compress_sorted_packed_pallas,
    )
    from combblas_tpu.ops.pallas.expand_kernel import (
        build_chunk_meta,
        expand_chunks,
        expand_chunks_compact,
    )

    # static args: raises at trace time, before any compile
    check_sort_limit(stream_cap if stream_cap is not None
                     else chunk_cap * 128, "expansion stream sort")
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, (a.shape, b.shape)
    stride = n + 1
    assert (m + 1) * stride < (1 << 31), (m, n)
    if b_rp is None:
        b_rp = b.row_ptr()
    meta, metaf, _, _flops = build_chunk_meta(
        a.row, a.col, a.val, a.mask(), b_rp[:-1], b_rp[1:], stride, chunk_cap
    )
    bc2, bv2 = b_tables if b_tables is not None else _tables_2d(b)
    if stream_cap is not None:
        key, val, _total = expand_chunks_compact(
            meta, metaf, bc2, bv2, sr, stream_cap=stream_cap,
            interpret=interpret)
    else:
        key, val = expand_chunks(meta, metaf, bc2, bv2, sr,
                                 interpret=interpret)
    key, val = jax.lax.sort((key, val), num_keys=1)
    out_cap = max(-(-out_capacity // 128) * 128, 2048)
    okey, oval, nnz = compress_sorted_packed_pallas(
        key, val, sr, out_capacity=out_cap, interpret=interpret
    )
    live = jnp.arange(out_cap, dtype=jnp.int32) < nnz
    return SpCOO(
        row=jnp.minimum(okey // stride, m),
        col=jnp.where(live, jnp.minimum(okey % stride, n), n),
        val=oval.astype(a.val.dtype),
        nnz=nnz,
        shape=(m, n),
    )


@functools.partial(
    jax.jit,
    static_argnames=("sr", "chunk_cap", "out_capacity", "stream_cap",
                     "interpret"),
)
def spgemm_pallas_wide(
    a: SpCOO,
    b: SpCOO,
    sr: Semiring = PLUS_TIMES,
    *,
    chunk_cap: int,
    out_capacity: int,
    stream_cap: int,
    interpret: bool = False,
    b_rp: jax.Array | None = None,
    b_tables=None,
) -> SpCOO:
    """Wide-key Pallas ESC SpGEMM: row and column ride as separate int32
    streams (``lax.sort(..., num_keys=2)``) so there is NO packed-key range
    limit — the large-scale path (square R-MAT A² overflows int32 packing at
    scale 19).  ~1.4x the narrow path's sort payload; everything else is the
    same segment-DMA expansion / single-pass compress design.
    Counterpart of the reference's 64-bit-index local multiply
    (``mtSpGEMM.h:214`` with IT=int64_t)."""
    from combblas_tpu.ops.pallas.compress_kernel import (
        compress_sorted_wide_pallas,
    )
    from combblas_tpu.ops.pallas.expand_kernel import (
        build_chunk_meta,
        expand_chunks_compact_wide,
    )

    m, k = a.shape
    k2, n = b.shape
    assert k == k2, (a.shape, b.shape)
    if b_rp is None:
        b_rp = b.row_ptr()
    # stride=0: the kernel's key stream is the raw B column ids; rows ride
    # meta col 4
    meta, metaf, _, _flops = build_chunk_meta(
        a.row, a.col, a.val, a.mask(), b_rp[:-1], b_rp[1:], 0, chunk_cap
    )
    bc2, bv2 = b_tables if b_tables is not None else _tables_2d(b)
    hi, lo, val, _total = expand_chunks_compact_wide(
        meta, metaf, bc2, bv2, sr, stream_cap=stream_cap, interpret=interpret
    )
    hi, lo, val = jax.lax.sort((hi, lo, val), num_keys=2)
    out_cap = max(-(-out_capacity // 128) * 128, 2048)
    ohi, olo, oval, nnz = compress_sorted_wide_pallas(
        hi, lo, val, sr, out_capacity=out_cap, interpret=interpret
    )
    live = jnp.arange(out_cap, dtype=jnp.int32) < nnz
    return SpCOO(
        row=jnp.minimum(ohi, m),
        col=jnp.where(live, jnp.minimum(olo, n), n),
        val=oval.astype(a.val.dtype),
        nnz=nnz,
        shape=(m, n),
    )


@jax.jit
def _row_flops_cum_f32(a: SpCOO, b: SpCOO):
    """(m,) float32 inclusive cumsum of per-row product counts — the balance
    curve for equal-flops slab boundaries.  f32 is approximate above 2^24 but
    boundaries only need balance, not exactness (exact per-slab stats are
    recomputed afterwards, guarded)."""
    m, k = a.shape
    b_rp = b.row_ptr()
    acol = jnp.minimum(a.col, k - 1)
    cnt = jnp.where(a.mask(), b_rp[acol + 1] - b_rp[acol], 0)
    rowfl = jax.ops.segment_sum(
        cnt.astype(jnp.float32),
        jnp.where(a.mask(), a.row, m),
        num_segments=m + 1,
    )[:m]
    return jnp.cumsum(rowfl)


@functools.partial(jax.jit, static_argnames=("num_slabs",))
def _equal_flops_bounds(a: SpCOO, b: SpCOO, *, num_slabs: int):
    """Equal-flops row boundaries (num_slabs+1,) via the f32 balance curve."""
    m = a.shape[0]
    cum = _row_flops_cum_f32(a, b)
    total = cum[-1]
    tgt = (jnp.arange(1, num_slabs, dtype=jnp.float32) * total) / num_slabs
    mid = jnp.searchsorted(cum, tgt).astype(jnp.int32) + 1
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.minimum(mid, m),
         jnp.full((1,), m, jnp.int32)]
    )


@functools.partial(jax.jit, static_argnames=("num_slabs",))
def _slab_stats(a: SpCOO, b: SpCOO, bounds, *, num_slabs: int):
    """Exact per-slab (nnz, chunks_i32, flops_i32, flops_f32 guard) for given
    row boundaries.  The f32 copies detect int32 wraparound (a slab whose
    true flops exceed ~2^30 is unusable and must be split further)."""
    from combblas_tpu.ops.pallas.expand_kernel import CH

    m, k = a.shape
    a_rp = a.row_ptr()
    b_rp = b.row_ptr()
    acol = jnp.minimum(a.col, k - 1)
    valid = a.mask()
    cnt = jnp.where(valid, b_rp[acol + 1] - b_rp[acol], 0)
    nch = jnp.where(valid, -(-cnt // CH), 0)
    sid = jnp.clip(
        jnp.searchsorted(bounds, jnp.minimum(a.row, m), side="right") - 1,
        0, num_slabs,
    ).astype(jnp.int32)
    sid = jnp.where(valid, sid, num_slabs)
    nnz_s = jax.ops.segment_sum(valid.astype(jnp.int32), sid,
                                num_segments=num_slabs + 1)[:-1]
    fl_s = jax.ops.segment_sum(cnt, sid, num_segments=num_slabs + 1)[:-1]
    fl_f = jax.ops.segment_sum(cnt.astype(jnp.float32), sid,
                               num_segments=num_slabs + 1)[:-1]
    ch_s = jax.ops.segment_sum(nch, sid, num_segments=num_slabs + 1)[:-1]
    return nnz_s, ch_s, fl_s, fl_f


def _pallas_slab_plan(a: SpCOO, b: SpCOO, num_slabs: int,
                      wide: bool = False):
    """Host-side slab plan: equal-flops boundaries (split further to respect
    the packed-key row-span limit and int32-safe per-slab flops) + uniform
    static capacities.  Returns (bounds np.int32 (S+1,), span_cap,
    slab_nnz_cap, chunk_cap, worst_fl).  ``wide`` drops the packed-key span
    limit (rows/cols sort as separate int32 keys), so slab count is purely
    memory/int32-flops driven."""
    m, k = a.shape
    n = b.shape[1]
    span_max = m if wide else max((1 << 31) // (n + 1) - 2, 1)
    num_slabs = max(1, min(num_slabs, m))
    for _ in range(8):  # replan if a slab still overflows int32
        bounds = np.asarray(_equal_flops_bounds(a, b, num_slabs=num_slabs))
        # split any slab whose row span exceeds the packed-key limit
        out = [0]
        for s in range(len(bounds) - 1):
            lo, hi = int(bounds[s]), int(bounds[s + 1])
            while hi - out[-1] > span_max:
                out.append(out[-1] + span_max)
            if hi > out[-1]:
                out.append(hi)
        bounds = np.asarray(out, np.int32)
        S = len(bounds) - 1
        nnz_s, ch_s, fl_s, fl_f = _slab_stats(
            a, b, jnp.asarray(bounds), num_slabs=S
        )
        fl_f = np.asarray(fl_f)
        if float(fl_f.max(initial=0.0)) < float(1 << 30):
            break
        num_slabs = max(num_slabs * 2, S + 1)
    worst_nnz = int(np.asarray(nnz_s).max(initial=1))
    worst_ch = int(np.asarray(ch_s).max(initial=1))
    worst_fl = int(np.asarray(fl_s).max(initial=1))
    span = int((bounds[1:] - bounds[:-1]).max(initial=1))
    span_cap = min(round_capacity_frac(max(span, 8)), m, span_max)
    span_cap = max(span_cap, span)  # never below the actual max span
    slab_nnz_cap = round_capacity_frac(max(worst_nnz, 8))
    chunk_cap = max(-(-round_capacity_frac(max(worst_ch, 256)) // 256) * 256,
                    256)
    return bounds, span_cap, slab_nnz_cap, chunk_cap, max(worst_fl, 1)


def _slab_extract(a: SpCOO, k: int, bounds, s, *, span_cap: int,
                  slab_nnz_cap: int):
    """A's nnz window for rows [bounds[s], bounds[s+1]), rows rebased
    slab-local.  Returns (sub SpCOO with shape (span_cap, k), row_lo)."""
    row_lo = bounds[s]
    row_hi = bounds[s + 1]
    # two scalar binary searches -- NOT the full m+1 row_ptr map, whose
    # searchsorted over the whole nnz array was a per-slab O(m log nnz)
    # tax (44 slabs x 2M rows at scale 21); pads carry row == m >= row_hi
    # so the sorted invariant covers them
    lohi = jnp.minimum(
        jnp.searchsorted(a.row, jnp.stack([row_lo, row_hi])).astype(
            jnp.int32),
        a.nnz)
    lo = lohi[0]
    hi = lohi[1]
    t = jnp.arange(slab_nnz_cap, dtype=jnp.int32)
    src = jnp.minimum(lo + t, a.capacity - 1)
    sel = t < (hi - lo)
    sub = SpCOO(
        row=jnp.where(sel, jnp.minimum(a.row[src] - row_lo, span_cap),
                      span_cap),
        col=jnp.where(sel, a.col[src], k),
        val=jnp.where(sel, a.val[src], 0),
        nnz=(hi - lo).astype(jnp.int32),
        shape=(span_cap, k),
    )
    return sub, row_lo


@functools.partial(
    jax.jit,
    static_argnames=("sr", "span_cap", "slab_nnz_cap", "chunk_cap",
                     "slab_out_cap", "stream_cap", "out_capacity",
                     "wide", "interpret"),
    donate_argnums=(4, 5, 6),  # dst buffers update in place across slabs
)
def _pallas_slab_step(
    a: SpCOO,
    b: SpCOO,
    b_rp,
    b_tables,
    bounds,
    s,
    dst_row,
    dst_col,
    dst_val,
    total,
    truncated,
    sr: Semiring,
    *,
    span_cap: int,
    slab_nnz_cap: int,
    chunk_cap: int,
    slab_out_cap: int,
    stream_cap: int,
    out_capacity: int,
    wide: bool = False,
    interpret: bool = False,
):
    """One slab: extract A's nnz window for rows [bounds[s], bounds[s+1]),
    rebase rows slab-local (packed keys must fit int31 per slab), run the
    Pallas expand+sort+compress pipeline, and append the compacted result at
    the running output offset with ONE contiguous dynamic_update_slice.

    The append writes the slab's full (sentinel-suffixed) buffer; the suffix
    is overwritten by the next slab's append, and the final suffix is already
    sentinel data — so assembly is a bandwidth-speed copy instead of the
    scatter that used to cost as much as the whole pipeline (XLA scatter runs
    ~200M el/s; dynamic_update_slice streams at HBM speed)."""
    m, k = a.shape
    n = b.shape[1]
    sub, row_lo = _slab_extract(a, k, bounds, s, span_cap=span_cap,
                                slab_nnz_cap=slab_nnz_cap)
    if wide:
        c = spgemm_pallas_wide(sub, b, sr, chunk_cap=chunk_cap,
                               out_capacity=slab_out_cap,
                               stream_cap=stream_cap, interpret=interpret,
                               b_rp=b_rp, b_tables=b_tables)
    else:
        c = spgemm_pallas(sub, b, sr, chunk_cap=chunk_cap,
                          out_capacity=slab_out_cap, stream_cap=stream_cap,
                          interpret=interpret, b_rp=b_rp, b_tables=b_tables)
    live = jnp.arange(c.capacity, dtype=jnp.int32) < c.nnz
    grow = jnp.where(live, c.row + row_lo, m)
    gcol = jnp.where(live, c.col, n)
    gval = jnp.where(live, c.val, 0)
    start = jnp.minimum(total, out_capacity)
    dst_row = jax.lax.dynamic_update_slice(dst_row, grow, (start,))
    dst_col = jax.lax.dynamic_update_slice(dst_col, gcol, (start,))
    dst_val = jax.lax.dynamic_update_slice(dst_val, gval, (start,))
    return (dst_row, dst_col, dst_val, total + c.nnz,
            truncated | (c.nnz >= slab_out_cap))


def spgemm_pallas_rowchunked(
    a: SpCOO,
    b: SpCOO,
    sr: Semiring = PLUS_TIMES,
    *,
    num_slabs: int,
    out_capacity: int,
    wide: bool = False,
    interpret: bool = False,
) -> SpCOO:
    """Memory-bounded Pallas SpGEMM over disjoint row slabs of A.

    Slabs are EQUAL-FLOPS row ranges (R-MAT skew makes uniform row ranges pad
    every slab's buffers to the heaviest slab — the balance curve fixes
    that), split further to respect the packed-key span limit.  All slabs run
    through ONE jitted step (boundaries are a traced array), so slab count
    does not multiply compile time.  Assembly is contiguous appends (see
    :func:`_pallas_slab_step`).  ``wide`` selects the dual-int32-key pipeline
    (no packed-key span limit — mandatory once n is large enough that even
    one-row slabs overflow int31, and much faster whenever the span limit
    would force more slabs than the memory budget does)."""
    m, k = a.shape
    n = b.shape[1]
    bounds, span_cap, slab_nnz_cap, chunk_cap, worst_fl = \
        _pallas_slab_plan(a, b, num_slabs, wide=wide)
    num_slabs = len(bounds) - 1
    assert wide or (span_cap + 1) * (n + 1) < (1 << 31), (span_cap, n)
    slab_out_cap = max(
        round_capacity_frac(
            min(worst_fl, max(2 * out_capacity // num_slabs, 2048))
        ),
        2048,
    )
    slab_out_cap = max(-(-slab_out_cap // 128) * 128, 2048)
    slab_stream_cap = stream_capacity(worst_fl)
    # slack: the last slab's sentinel suffix lands beyond the live region
    cap_slack = out_capacity + slab_out_cap
    state = (
        jnp.full((cap_slack,), m, jnp.int32),
        jnp.full((cap_slack,), n, jnp.int32),
        jnp.zeros((cap_slack,), a.val.dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    bounds_dev = jnp.asarray(bounds)
    b_rp = b.row_ptr()  # slab-invariant: computed once, not per step
    b_tables = _tables_2d(b)
    for s in range(num_slabs):
        state = _pallas_slab_step(
            a, b, b_rp, b_tables, bounds_dev, jnp.asarray(s, jnp.int32),
            *state, sr,
            span_cap=span_cap, slab_nnz_cap=slab_nnz_cap,
            chunk_cap=chunk_cap, slab_out_cap=slab_out_cap,
            stream_cap=slab_stream_cap, out_capacity=out_capacity,
            wide=wide, interpret=interpret,
        )
    row, col, val, total, truncated = state
    total = jnp.minimum(jnp.where(truncated, out_capacity, total),
                        out_capacity)
    return SpCOO(row=row, col=col, val=val, nnz=total.astype(jnp.int32),
                 shape=(m, n))


@functools.partial(
    jax.jit,
    static_argnames=("sr", "span_cap", "slab_nnz_cap", "chunk_cap",
                     "slab_out_cap", "stream_cap", "wide", "interpret"),
)
def _pallas_slab_digest_step(
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
    wide: bool = False,
    interpret: bool = False,
):
    """One slab of :func:`spgemm_pallas_streamed`: compute the slab's C block
    fully, fold it into the running digest, and discard it.  The nnz total
    accumulates as 16-bit-split int32 partials (scale-22 A² outputs exceed
    int32; same trick as :func:`_flops_partials`) so no per-slab host sync
    is needed and the host combines exactly in int64."""
    k = a.shape[1]
    sub, _row_lo = _slab_extract(a, k, bounds, s, span_cap=span_cap,
                                 slab_nnz_cap=slab_nnz_cap)
    if wide:
        c = spgemm_pallas_wide(sub, b, sr, chunk_cap=chunk_cap,
                               out_capacity=slab_out_cap,
                               stream_cap=stream_cap, interpret=interpret,
                               b_rp=b_rp, b_tables=b_tables)
    else:
        c = spgemm_pallas(sub, b, sr, chunk_cap=chunk_cap,
                          out_capacity=slab_out_cap, stream_cap=stream_cap,
                          interpret=interpret, b_rp=b_rp, b_tables=b_tables)
    live = jnp.arange(c.capacity, dtype=jnp.int32) < c.nnz
    cs = jnp.sum(jnp.where(live, c.val.astype(jnp.float32), 0.0))
    return (total_lo + (c.nnz & 0xFFFF), total_hi + (c.nnz >> 16),
            checksum + cs, truncated | (c.nnz >= slab_out_cap))


def spgemm_pallas_streamed(
    a: SpCOO,
    b: SpCOO,
    sr: Semiring = PLUS_TIMES,
    *,
    num_slabs: int,
    wide: bool = False,
    slab_out_cap: int | None = None,
    interpret: bool = False,
):
    """Slab-streamed SpGEMM for products whose ASSEMBLED output exceeds
    device memory: every slab's C block is fully formed, merged, and
    compacted on device, then folded into a digest and released — the
    product is *computed* but never resident all at once.  This is the
    terminal form of the reference's memory-bounded phasing
    (``MemEfficientSpGEMM``, ``ParFriends.h:450``): phases exist precisely
    because full C does not fit, and its MCL caller likewise consumes each
    phase's output (prune/select) without ever holding raw C.

    Returns (nnz_total int, checksum float, truncated bool).  Callers that
    need the actual entries consume them per-slab via
    :func:`spgemm_pallas_rowchunked` on row ranges instead."""
    m, k = a.shape
    bounds, span_cap, slab_nnz_cap, chunk_cap, worst_fl = \
        _pallas_slab_plan(a, b, num_slabs, wide=wide)
    num_slabs = len(bounds) - 1
    if slab_out_cap is None:
        slab_out_cap = round_capacity_frac(max(worst_fl, 2048))
    slab_out_cap = max(-(-slab_out_cap // 128) * 128, 2048)
    slab_stream_cap = stream_capacity(worst_fl)
    state = (
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0.0, jnp.float32),
        jnp.asarray(False),
    )
    bounds_dev = jnp.asarray(bounds)
    b_rp = b.row_ptr()  # slab-invariant: computed once, not per step
    b_tables = _tables_2d(b)
    for s in range(num_slabs):
        state = _pallas_slab_digest_step(
            a, b, b_rp, b_tables, bounds_dev, jnp.asarray(s, jnp.int32),
            *state, sr,
            span_cap=span_cap, slab_nnz_cap=slab_nnz_cap,
            chunk_cap=chunk_cap, slab_out_cap=slab_out_cap,
            stream_cap=slab_stream_cap, wide=wide, interpret=interpret,
        )
    total_lo, total_hi, checksum, truncated = state
    total = int(total_lo) + (int(total_hi) << 16)  # exact in host int
    return total, checksum, truncated


def _pallas_backend_ok(a: SpCOO, b: SpCOO) -> bool:
    """Whether the Pallas kernel path applies at all (TPU backend, float32
    values).  Packed-key range is handled per call site — the row-chunked
    variant rebases keys per slab."""
    import jax.extend.backend as jxb

    try:
        backend = jxb.get_backend().platform
    except Exception:
        backend = "cpu"
    return (
        backend in ("tpu", "axon")
        and a.val.dtype == jnp.float32
        and b.val.dtype == jnp.float32
    )


def _pallas_ok(a: SpCOO, b: SpCOO) -> bool:
    """Single-shot Pallas path: backend + packed keys fit int32."""
    return (
        _pallas_backend_ok(a, b)
        and (a.shape[0] + 1) * (b.shape[1] + 1) < (1 << 31)
    )


# XLA's stable sort cannot exceed 2^31-1 elements; every ESC pipeline here
# sorts a stream bounded by its flops/stream cap, so caps must stay below
# this (library-enforced — VERDICT r4 item 7; the r4 bench tripped XLA's
# raw error at MCL scale).  2^30 leaves headroom for staging slack.
SORT_ELEM_LIMIT = 1 << 30


class SpGEMMSortLimitError(ValueError):
    """A single sort stage would exceed XLA's 2^31-element stable-sort
    limit.  Use spgemm_auto (auto-slabs), spgemm_streamed_seg2, or a
    smaller flops_cap."""


def check_sort_limit(n_elems: int, what: str = "sort stream") -> None:
    if n_elems > SORT_ELEM_LIMIT:
        raise SpGEMMSortLimitError(
            f"{what} of {n_elems} elements exceeds the XLA stable-sort "
            f"limit ({SORT_ELEM_LIMIT}); use spgemm_auto / seg2 slabbing "
            "or lower flops_cap")


def spgemm_auto(a: SpCOO, b: SpCOO, sr: Semiring = PLUS_TIMES, *,
                max_flops_cap: int = 1 << 24, out_capacity: int | None = None,
                nnz_estimate: int | None = None,
                plan: dict | None = None) -> SpCOO:
    """Host-driven dispatcher: single-pass when the expansion fits, row-chunked
    otherwise, with estimate-and-retry output sizing.

    Oversized output buffers multiply streamed traffic (every compress pass
    touches out_capacity-sized arrays), so, like the reference's symbolic
    estimate-then-allocate protocol (``estimateNNZ_Hash``, ``mtSpGEMM.h:807``),
    the output is sized from an estimate (``nnz_estimate``, e.g. last
    iteration's nnz in MCL; default flops/2 bounded by the dense cell count)
    and the multiply retried with a doubled buffer when compression reports
    truncation (nnz == capacity) — rare, and each retry is cheap relative to
    a always-worst-case buffer.

    ``plan``: a caller-held mutable dict freezing every static shape
    (pipeline choice + capacities, sized with headroom).  Iterated callers
    (the MCL expansion loop) pass the same dict each call: while the
    operands' capacities match and the product's flops fit the frozen
    stream, the exact compiled executable is reused — no replanning, no
    recompiles (VERDICT r4: capacity drift made every MCL iteration a
    fresh ~25 s compile through the remote service)."""
    # library-enforced sort bound: a single slab never sorts > 2^31 elems
    max_flops_cap = min(max_flops_cap, SORT_ELEM_LIMIT)
    dense_cells = a.shape[0] * b.shape[1]
    key = (int(a.capacity), int(b.capacity), a.shape, b.shape,
           out_capacity, id(sr))
    flops_exact = int(spgemm_flops(a, b))
    if plan is not None and plan.get("key") == key and \
            flops_exact <= plan["flops_ok"] and \
            flops_exact * 64 >= plan["flops_ok"]:
        # reuse frozen statics below; the lower bound forces a replan
        # (and shrink) only on a 64x collapse: oversized buffers cost
        # streamed compress traffic, but far less than a fresh ~25 s
        # remote compile — MCL's fast early decay must NOT replan every
        # iteration (measured 29 s/iter of pure recompilation at 8x)
        pass
    else:
        fresh: dict = {}
        # freeze above current flops: every steady-state pass sorts the
        # frozen stream, so headroom is paid every iteration — 1.5x is
        # enough band for MCL's post-peak growth without replans
        froz_fl = round_capacity_frac(
            max(flops_exact, 8) * 3 // 2 if plan is not None
            else max(flops_exact, 8))
        flops_cap = round_capacity_frac(max(flops_exact, 8))
        oc = flops_cap
        if out_capacity is not None:
            out_cap = out_capacity
        else:
            est = nnz_estimate if nnz_estimate is not None else max(
                flops_cap // 2, 8
            )
            out_cap = round_capacity_frac(
                int(min(est, oc, max(dense_cells, 8))))
        fresh.update(key=key, flops_ok=froz_fl, out_cap=out_cap, oc=oc,
                     kind="sort", flops_cap=round_capacity_frac(froz_fl))
        if _pallas_backend_ok(a, b):
            chunk_cap, _ = spgemm_pallas_bounds(a, b)
            chunk_cap = max(-(-round_capacity_frac(
                chunk_cap * (3 if plan is not None else 2) // 2)
                // 256) * 256, 256)
            scap = stream_capacity(froz_fl)
            limit = max(max_flops_cap, flops_cap * 2)
            single_ok = ((a.shape[0] + 1) * (b.shape[1] + 1) < (1 << 31)
                         and scap <= SORT_ELEM_LIMIT)
            if single_ok and scap <= limit:
                fresh.update(kind="pallas", chunk_cap=chunk_cap, scap=scap)
            else:
                # memory-driven slab count; the wide (dual-int32-key)
                # pipeline removes the per-slab packed-key row-span limit,
                # so key range never multiplies the slab count
                m, n = a.shape[0], b.shape[1]
                mem_slabs = -(-flops_exact // max_flops_cap)
                key_slabs = -(-(m + 1) // max((1 << 31) // (n + 1) - 1, 1))
                wide = key_slabs > mem_slabs
                nslabs = max(mem_slabs, 2) if wide else max(
                    key_slabs, mem_slabs, 2)
                if nslabs <= max(a.shape[0], 1):
                    fresh.update(kind="pallas_slabs", num_slabs=nslabs,
                                 wide=wide)
        if fresh["kind"] == "sort" and flops_cap > max_flops_cap:
            fresh.update(kind="rowchunked",
                         num_slabs=-(-flops_cap // max_flops_cap) * 2)
        if plan is None:
            plan = fresh
        else:
            plan.clear()
            plan.update(fresh)
    out_cap = plan["out_cap"]
    while True:
        if plan["kind"] == "pallas":
            c = spgemm_pallas(a, b, sr, chunk_cap=plan["chunk_cap"],
                              out_capacity=out_cap, stream_cap=plan["scap"])
        elif plan["kind"] == "pallas_slabs":
            c = spgemm_pallas_rowchunked(
                a, b, sr, num_slabs=plan["num_slabs"], out_capacity=out_cap,
                wide=plan["wide"])
        elif plan["kind"] == "sort":
            check_sort_limit(plan["flops_cap"], "ESC expansion")
            c = spgemm(a, b, sr, flops_cap=plan["flops_cap"],
                       out_capacity=out_cap)
        else:
            slab_cap, slab_rows = _slab_bounds_host(a, b, plan["num_slabs"])
            c = spgemm_rowchunked(
                a, b, sr,
                num_slabs=plan["num_slabs"], slab_rows=slab_rows,
                flops_cap=slab_cap, out_capacity=out_cap,
            )
        full = int(c.nnz) >= out_cap
        if not full or out_cap >= min(plan["oc"], max(dense_cells, 8)):
            return c
        out_cap = round_capacity_frac(out_cap * 2)
        plan["out_cap"] = out_cap
