"""Pallas-TPU ESC expansion kernel: per-run segment DMA instead of gathers.

The ESC expansion must read, for every product a_ik * b_kj, B's column id and
value — 2 x flops random lookups.  XLA's TPU gather runs at ~116M lookups/s
(measured on v5e), ~10-16x slower than the DMA engines moving the same data as
contiguous row segments.  This kernel exploits that every A-nonzero reads a
*contiguous* B range [rp_lo, rp_hi) (the reference's per-column expansion in
``mtSpGEMM.h:214`` walks the same ranges pointer-wise): the expansion is cut
into <=128-element *chunks*, one DMA each, landed in lane-aligned output rows.

Per chunk c (metadata built in XLA by :func:`build_chunk_meta`):
  - DMA rows [src_row, src_row+2) of the (rows, 128)-shaped b_col / b_val
    tables into VMEM scratch (double rows cover lane misalignment),
  - realign by ``mis`` lanes (take_along_axis over lanes + sublane roll),
  - emit ``key = key_base + b_col`` (key_base = i*(n+1), so key is the packed
    sort key) and ``val = sr.mul(a_val, b_val)``; slots past the chunk's
    ``vlen`` get INT32_MAX sentinel keys, which sort after every real entry.

Output is the chunk-padded (key, val) stream — sentinel padding costs ~25-30%
extra sort traffic but removes ~1s of gather time per 50M products.  Measured
rate: 32M products in ~64ms at 262k chunks (CHROWS=1, CPB=16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from combblas_tpu.semiring import PLUS_TIMES, Semiring

__all__ = [
    "build_chunk_meta",
    "expand_chunks",
    "expand_chunks_compact",
    "expand_chunks_compact_wide",
    "CH",
]

#: chunk element size == lane width; one DMA covers CHROWS+1=2 table rows.
CH = 128
_CPB = 16  # chunks per grid step
_SENT = jnp.iinfo(jnp.int32).max


def build_chunk_meta(
    a_row: jax.Array,
    a_col: jax.Array,
    a_val: jax.Array,
    a_valid: jax.Array,
    rp_lo: jax.Array,
    rp_hi: jax.Array,
    stride: int,
    chunk_cap: int,
):
    """Per-chunk metadata via the delta-scatter + cumsum forward fill.

    Returns (meta int32[chunk_cap, 8], metaf f32[chunk_cap, 1], total_ch,
    total_flops).  Dummy chunks past ``total_ch`` have vlen == 0 (the kernel
    emits all-sentinel rows for them).  Fields: 0=src_row, 1=mis, 2=vlen,
    3=key_base, 4=a_row (for the wide-key kernels, where row and column
    travel as separate int32 streams because the packed product m*n
    overflows int32).
    """
    kk = rp_lo.shape[0]
    cap_a = a_row.shape[0]
    acol = jnp.minimum(a_col, kk - 1)
    lo = rp_lo[acol]
    cnt = jnp.where(a_valid, rp_hi[acol] - lo, 0)
    total_flops = jnp.sum(cnt)
    nch = -(-cnt // CH)  # per-nonzero chunk count
    choff = jnp.cumsum(nch)
    total_ch = choff[-1]
    ch_start = choff - nch
    has = nch > 0
    pos = jnp.where(has, ch_start, chunk_cap)
    rank = jnp.cumsum(has.astype(jnp.int32)) - 1
    r_sc = jnp.where(has, rank, cap_a)

    def fill(payload_int):
        compact = jnp.zeros((cap_a,), jnp.int32).at[r_sc].set(
            payload_int, mode="drop"
        )
        prev = compact[jnp.maximum(rank - 1, 0)]
        delta = jnp.where(rank > 0, payload_int - prev, payload_int)
        seeded = jnp.zeros((chunk_cap,), jnp.int32).at[pos].set(
            delta, mode="drop"
        )
        return jnp.cumsum(seeded)

    tc = jnp.arange(chunk_cap, dtype=jnp.int32)
    f_lo = fill(lo)
    f_cnt = fill(cnt)
    f_start = fill(ch_start)
    f_kb = fill(a_row * stride)
    f_av = jax.lax.bitcast_convert_type(
        fill(jax.lax.bitcast_convert_type(a_val.astype(jnp.float32),
                                          jnp.int32)),
        jnp.float32,
    )
    f_ar = fill(a_row)
    r = tc - f_start
    live = tc < total_ch
    elem = f_lo + r * CH
    vlen = jnp.clip(f_cnt - r * CH, 0, CH)
    vlen = jnp.where(live, vlen, 0)
    src_row = jnp.where(live, elem // CH, 0)
    mis = jnp.where(live, elem % CH, 0)
    kb = jnp.where(live, f_kb, 0)
    arow = jnp.where(live, f_ar, 0)
    meta = jnp.stack(
        [src_row, mis, vlen, kb, arow, tc, tc, tc], axis=1
    )  # cols 5-7 unused padding for an 8-wide SMEM row
    metaf = f_av[:, None]
    return meta, metaf, total_ch, total_flops


def _expand_kernel(sr: Semiring):
    def kernel(meta_ref, metaf_ref, bc_ref, bv_ref, okey_ref, oval_ref,
               scr_c, scr_v, sems):
        def issue(k, _):
            # dummy chunks (vlen == 0, the cap slack) must not issue DMAs:
            # with pow4-rounded chunk caps they would otherwise stream
            # gigabytes of dead B rows per run
            @pl.when(meta_ref[k, 2] > 0)
            def _():
                s = meta_ref[k, 0]
                pltpu.make_async_copy(bc_ref.at[pl.ds(s, 2)], scr_c.at[k],
                                      sems.at[k, 0]).start()
                pltpu.make_async_copy(bv_ref.at[pl.ds(s, 2)], scr_v.at[k],
                                      sems.at[k, 1]).start()
            return 0

        jax.lax.fori_loop(0, _CPB, issue, 0, unroll=True)

        lane2 = jax.lax.broadcasted_iota(jnp.int32, (2, CH), 1)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)

        def consume(k, _):
            mis = meta_ref[k, 1]
            vlen = meta_ref[k, 2]
            kb = meta_ref[k, 3]
            av = metaf_ref[k, 0]
            @pl.when(vlen > 0)
            def _():
                pltpu.make_async_copy(
                    bc_ref.at[pl.ds(meta_ref[k, 0], 2)],
                    scr_c.at[k], sems.at[k, 0]).wait()
                pltpu.make_async_copy(
                    bv_ref.at[pl.ds(meta_ref[k, 0], 2)],
                    scr_v.at[k], sems.at[k, 1]).wait()
            idx = (lane2 + mis) % CH
            wrap = (lane2 + mis) >= CH
            cr = jnp.take_along_axis(scr_c[k], idx, axis=1)
            vr = jnp.take_along_axis(scr_v[k], idx, axis=1)
            calign = jnp.where(wrap, pltpu.roll(cr, 1, 0), cr)[:1]
            valign = jnp.where(wrap, pltpu.roll(vr, 1, 0), vr)[:1]
            ok = lane1 < vlen
            okey_ref[pl.ds(k, 1), :] = jnp.where(ok, kb + calign, _SENT)
            oval_ref[pl.ds(k, 1), :] = jnp.where(
                ok, sr.mul(av, valign), jnp.zeros_like(valign)
            )
            return 0

        jax.lax.fori_loop(0, _CPB, consume, 0, unroll=True)

    return kernel


_SR = 16  # staging rows for the compacted writer; flush emits _SR-1 rows


def _expand_compact_kernel(sr: Semiring, out_rows: int, total_steps: int):
    def kernel(meta_ref, metaf_ref, bc_ref, bv_ref, _kinit_ref, _vinit_ref,
               okey_ref, oval_ref, cnt_ref, scr_c, scr_v, stage_k, stage_v,
               st, sems, sem_k, sem_v):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            st[0] = 0   # staging fill count
            st[1] = 0   # output row cursor

        def issue(k, _):
            # dummy chunks (vlen == 0, the cap slack) must not issue DMAs:
            # with pow4-rounded chunk caps they would otherwise stream
            # gigabytes of dead B rows per run
            @pl.when(meta_ref[k, 2] > 0)
            def _():
                s = meta_ref[k, 0]
                pltpu.make_async_copy(bc_ref.at[pl.ds(s, 2)], scr_c.at[k],
                                      sems.at[k, 0]).start()
                pltpu.make_async_copy(bv_ref.at[pl.ds(s, 2)], scr_v.at[k],
                                      sems.at[k, 1]).start()
            return 0

        jax.lax.fori_loop(0, _CPB, issue, 0, unroll=True)

        lane2 = jax.lax.broadcasted_iota(jnp.int32, (2, CH), 1)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)
        max_flush_row = out_rows - (_SR - 1)

        def consume(k, _):
            mis = meta_ref[k, 1]
            vlen = meta_ref[k, 2]
            kb = meta_ref[k, 3]
            av = metaf_ref[k, 0]
            @pl.when(vlen > 0)
            def _():
                pltpu.make_async_copy(
                    bc_ref.at[pl.ds(meta_ref[k, 0], 2)],
                    scr_c.at[k], sems.at[k, 0]).wait()
                pltpu.make_async_copy(
                    bv_ref.at[pl.ds(meta_ref[k, 0], 2)],
                    scr_v.at[k], sems.at[k, 1]).wait()

            @pl.when(vlen > 0)
            def _():
                idx = (lane2 + mis) % CH
                wrap = (lane2 + mis) >= CH
                cr = jnp.take_along_axis(scr_c[k], idx, axis=1)
                vr = jnp.take_along_axis(scr_v[k], idx, axis=1)
                calign = jnp.where(wrap, pltpu.roll(cr, 1, 0), cr)[:1]
                valign = jnp.where(wrap, pltpu.roll(vr, 1, 0), vr)[:1]
                keyrow = kb + calign
                valrow = sr.mul(av, valign)
                fc = st[0]
                fo = fc % CH
                ro = fc // CH
                rk = pltpu.roll(keyrow, fo, 1)
                rv = pltpu.roll(valrow, fo, 1)
                m1 = (lane1 >= fo) & (lane1 < fo + vlen)
                pltpu.store(stage_k.at[pl.ds(ro, 1), :], rk, mask=m1)
                pltpu.store(stage_v.at[pl.ds(ro, 1), :], rv, mask=m1)
                m2 = lane1 < (fo + vlen - CH)
                pltpu.store(stage_k.at[pl.ds(ro + 1, 1), :], rk, mask=m2)
                pltpu.store(stage_v.at[pl.ds(ro + 1, 1), :], rv, mask=m2)
                st[0] = fc + vlen

            @pl.when(st[0] >= (_SR - 1) * CH)
            def _():
                orow = jnp.minimum(st[1], max_flush_row)
                dk = pltpu.make_async_copy(
                    stage_k.at[pl.ds(0, _SR - 1)],
                    okey_ref.at[pl.ds(orow, _SR - 1)], sem_k)
                dv = pltpu.make_async_copy(
                    stage_v.at[pl.ds(0, _SR - 1)],
                    oval_ref.at[pl.ds(orow, _SR - 1)], sem_v)
                dk.start(); dv.start(); dk.wait(); dv.wait()
                stage_k[0, :] = stage_k[_SR - 1, :]
                stage_v[0, :] = stage_v[_SR - 1, :]
                st[0] = st[0] - (_SR - 1) * CH
                st[1] = st[1] + (_SR - 1)

            return 0

        jax.lax.fori_loop(0, _CPB, consume, 0, unroll=True)

        @pl.when(b == total_steps - 1)
        def _():
            # sentinel-fill the staging tail so the fixed-width final flush
            # never exposes stale rows past the true fill point
            fc = st[0]
            fo = fc % CH
            ro = fc // CH
            pltpu.store(stage_k.at[pl.ds(ro, 1), :],
                        jnp.full((1, CH), _SENT, jnp.int32),
                        mask=lane1 >= fo)
            pltpu.store(stage_v.at[pl.ds(ro, 1), :],
                        jnp.zeros((1, CH), stage_v.dtype),
                        mask=lane1 >= fo)
            for r in range(1, _SR):
                @pl.when(r > ro)
                def _():
                    stage_k[r, :] = jnp.full((CH,), _SENT, jnp.int32)
                    stage_v[r, :] = jnp.zeros((CH,), stage_v.dtype)

            orow = jnp.minimum(st[1], max_flush_row)
            dk = pltpu.make_async_copy(
                stage_k.at[pl.ds(0, _SR - 1)],
                okey_ref.at[pl.ds(orow, _SR - 1)], sem_k)
            dv = pltpu.make_async_copy(
                stage_v.at[pl.ds(0, _SR - 1)],
                oval_ref.at[pl.ds(orow, _SR - 1)], sem_v)
            dk.start(); dv.start(); dk.wait(); dv.wait()
            cnt_ref[0] = st[1] * CH + st[0]

    return kernel


@functools.partial(jax.jit, static_argnames=("sr", "stream_cap", "interpret"))
def expand_chunks_compact(
    meta: jax.Array,
    metaf: jax.Array,
    b_col2d: jax.Array,
    b_val2d: jax.Array,
    sr: Semiring = PLUS_TIMES,
    *,
    stream_cap: int,
    interpret: bool = False,
):
    """Compacted-output expansion: like :func:`expand_chunks` but each
    chunk's ``vlen`` valid products append to a staging buffer flushed by
    row-granular DMAs, so the output stream has NO chunk padding — the sort
    and compress stages then process exactly flops elements instead of
    ~1.3-1.7x that (chunk padding ratio on R-MAT workloads).

    ``stream_cap`` must be >= flops + (_SR+1)*128 and a multiple of 128;
    entries past the true total stay at the initialization sentinel
    (INT32_MAX / 0), supplied via input-output aliasing.  Returns (key, val,
    total)."""
    chunk_cap = meta.shape[0]
    assert chunk_cap % _CPB == 0, chunk_cap
    assert stream_cap % CH == 0, stream_cap
    out_rows = stream_cap // CH
    assert out_rows >= _SR, out_rows
    grid = (chunk_cap // _CPB,)
    key_init = jnp.full((out_rows, CH), _SENT, jnp.int32)
    val_init = jnp.zeros((out_rows, CH), b_val2d.dtype)
    key2d, val2d, cnt = pl.pallas_call(
        _expand_compact_kernel(sr, out_rows, grid[0]),
        out_shape=(
            jax.ShapeDtypeStruct((out_rows, CH), jnp.int32),
            jax.ShapeDtypeStruct((out_rows, CH), b_val2d.dtype),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_CPB, 8), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_CPB, 1), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((_CPB, 2, CH), jnp.int32),
            pltpu.VMEM((_CPB, 2, CH), b_val2d.dtype),
            pltpu.VMEM((_SR, CH), jnp.int32),
            pltpu.VMEM((_SR, CH), b_val2d.dtype),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((_CPB, 2)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, metaf, b_col2d, b_val2d, key_init, val_init)
    return key2d.reshape(-1), val2d.reshape(-1), cnt[0]


def _expand_compact_wide_kernel(sr: Semiring, out_rows: int,
                                total_steps: int):
    """Wide-key compacted expansion: like :func:`_expand_compact_kernel` but
    the sort key travels as TWO int32 streams (row, col) instead of one
    packed int32 — required once m*n overflows int32 (R-MAT scale >= 19 for
    square A²).  The row of a chunk is a scalar (meta col 4); the column
    stream is the realigned B column ids.  Pads carry (_SENT, _SENT)."""

    def kernel(meta_ref, metaf_ref, bc_ref, bv_ref, _rinit_ref, _kinit_ref,
               _vinit_ref, orow_ref, okey_ref, oval_ref, cnt_ref, scr_c,
               scr_v, stage_r, stage_k, stage_v, st, sems, sem_r, sem_k,
               sem_v):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            st[0] = 0   # staging fill count
            st[1] = 0   # output row cursor

        def issue(k, _):
            # dummy chunks (vlen == 0, the cap slack) must not issue DMAs:
            # with pow4-rounded chunk caps they would otherwise stream
            # gigabytes of dead B rows per run
            @pl.when(meta_ref[k, 2] > 0)
            def _():
                s = meta_ref[k, 0]
                pltpu.make_async_copy(bc_ref.at[pl.ds(s, 2)], scr_c.at[k],
                                      sems.at[k, 0]).start()
                pltpu.make_async_copy(bv_ref.at[pl.ds(s, 2)], scr_v.at[k],
                                      sems.at[k, 1]).start()
            return 0

        jax.lax.fori_loop(0, _CPB, issue, 0, unroll=True)

        lane2 = jax.lax.broadcasted_iota(jnp.int32, (2, CH), 1)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)
        max_flush_row = out_rows - (_SR - 1)

        def consume(k, _):
            mis = meta_ref[k, 1]
            vlen = meta_ref[k, 2]
            arow = meta_ref[k, 4]
            av = metaf_ref[k, 0]
            @pl.when(vlen > 0)
            def _():
                pltpu.make_async_copy(
                    bc_ref.at[pl.ds(meta_ref[k, 0], 2)],
                    scr_c.at[k], sems.at[k, 0]).wait()
                pltpu.make_async_copy(
                    bv_ref.at[pl.ds(meta_ref[k, 0], 2)],
                    scr_v.at[k], sems.at[k, 1]).wait()

            @pl.when(vlen > 0)
            def _():
                idx = (lane2 + mis) % CH
                wrap = (lane2 + mis) >= CH
                cr = jnp.take_along_axis(scr_c[k], idx, axis=1)
                vr = jnp.take_along_axis(scr_v[k], idx, axis=1)
                calign = jnp.where(wrap, pltpu.roll(cr, 1, 0), cr)[:1]
                valign = jnp.where(wrap, pltpu.roll(vr, 1, 0), vr)[:1]
                rowrow = jnp.full((1, CH), arow, jnp.int32)
                keyrow = calign
                valrow = sr.mul(av, valign)
                fc = st[0]
                fo = fc % CH
                ro = fc // CH
                rr = pltpu.roll(rowrow, fo, 1)
                rk = pltpu.roll(keyrow, fo, 1)
                rv = pltpu.roll(valrow, fo, 1)
                m1 = (lane1 >= fo) & (lane1 < fo + vlen)
                pltpu.store(stage_r.at[pl.ds(ro, 1), :], rr, mask=m1)
                pltpu.store(stage_k.at[pl.ds(ro, 1), :], rk, mask=m1)
                pltpu.store(stage_v.at[pl.ds(ro, 1), :], rv, mask=m1)
                m2 = lane1 < (fo + vlen - CH)
                pltpu.store(stage_r.at[pl.ds(ro + 1, 1), :], rr, mask=m2)
                pltpu.store(stage_k.at[pl.ds(ro + 1, 1), :], rk, mask=m2)
                pltpu.store(stage_v.at[pl.ds(ro + 1, 1), :], rv, mask=m2)
                st[0] = fc + vlen

            @pl.when(st[0] >= (_SR - 1) * CH)
            def _():
                orow = jnp.minimum(st[1], max_flush_row)
                dr = pltpu.make_async_copy(
                    stage_r.at[pl.ds(0, _SR - 1)],
                    orow_ref.at[pl.ds(orow, _SR - 1)], sem_r)
                dk = pltpu.make_async_copy(
                    stage_k.at[pl.ds(0, _SR - 1)],
                    okey_ref.at[pl.ds(orow, _SR - 1)], sem_k)
                dv = pltpu.make_async_copy(
                    stage_v.at[pl.ds(0, _SR - 1)],
                    oval_ref.at[pl.ds(orow, _SR - 1)], sem_v)
                dr.start(); dk.start(); dv.start()
                dr.wait(); dk.wait(); dv.wait()
                stage_r[0, :] = stage_r[_SR - 1, :]
                stage_k[0, :] = stage_k[_SR - 1, :]
                stage_v[0, :] = stage_v[_SR - 1, :]
                st[0] = st[0] - (_SR - 1) * CH
                st[1] = st[1] + (_SR - 1)

            return 0

        jax.lax.fori_loop(0, _CPB, consume, 0, unroll=True)

        @pl.when(b == total_steps - 1)
        def _():
            fc = st[0]
            fo = fc % CH
            ro = fc // CH
            pltpu.store(stage_r.at[pl.ds(ro, 1), :],
                        jnp.full((1, CH), _SENT, jnp.int32),
                        mask=lane1 >= fo)
            pltpu.store(stage_k.at[pl.ds(ro, 1), :],
                        jnp.full((1, CH), _SENT, jnp.int32),
                        mask=lane1 >= fo)
            pltpu.store(stage_v.at[pl.ds(ro, 1), :],
                        jnp.zeros((1, CH), stage_v.dtype),
                        mask=lane1 >= fo)
            for r in range(1, _SR):
                @pl.when(r > ro)
                def _():
                    stage_r[r, :] = jnp.full((CH,), _SENT, jnp.int32)
                    stage_k[r, :] = jnp.full((CH,), _SENT, jnp.int32)
                    stage_v[r, :] = jnp.zeros((CH,), stage_v.dtype)

            orow = jnp.minimum(st[1], max_flush_row)
            dr = pltpu.make_async_copy(
                stage_r.at[pl.ds(0, _SR - 1)],
                orow_ref.at[pl.ds(orow, _SR - 1)], sem_r)
            dk = pltpu.make_async_copy(
                stage_k.at[pl.ds(0, _SR - 1)],
                okey_ref.at[pl.ds(orow, _SR - 1)], sem_k)
            dv = pltpu.make_async_copy(
                stage_v.at[pl.ds(0, _SR - 1)],
                oval_ref.at[pl.ds(orow, _SR - 1)], sem_v)
            dr.start(); dk.start(); dv.start()
            dr.wait(); dk.wait(); dv.wait()
            cnt_ref[0] = st[1] * CH + st[0]

    return kernel


@functools.partial(jax.jit, static_argnames=("sr", "stream_cap", "interpret"))
def expand_chunks_compact_wide(
    meta: jax.Array,
    metaf: jax.Array,
    b_col2d: jax.Array,
    b_val2d: jax.Array,
    sr: Semiring = PLUS_TIMES,
    *,
    stream_cap: int,
    interpret: bool = False,
):
    """Wide-key compacted expansion: (row, col, val, total) streams with no
    chunk padding.  ``meta`` must come from :func:`build_chunk_meta` called
    with ``stride=0`` (rows ride meta col 4, columns are un-based B ids).
    Sort downstream with ``jax.lax.sort((row, col, val), num_keys=2)``."""
    chunk_cap = meta.shape[0]
    assert chunk_cap % _CPB == 0, chunk_cap
    assert stream_cap % CH == 0, stream_cap
    out_rows = stream_cap // CH
    assert out_rows >= _SR, out_rows
    grid = (chunk_cap // _CPB,)
    row_init = jnp.full((out_rows, CH), _SENT, jnp.int32)
    key_init = jnp.full((out_rows, CH), _SENT, jnp.int32)
    val_init = jnp.zeros((out_rows, CH), b_val2d.dtype)
    row2d, key2d, val2d, cnt = pl.pallas_call(
        _expand_compact_wide_kernel(sr, out_rows, grid[0]),
        out_shape=(
            jax.ShapeDtypeStruct((out_rows, CH), jnp.int32),
            jax.ShapeDtypeStruct((out_rows, CH), jnp.int32),
            jax.ShapeDtypeStruct((out_rows, CH), b_val2d.dtype),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_CPB, 8), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_CPB, 1), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((_CPB, 2, CH), jnp.int32),
            pltpu.VMEM((_CPB, 2, CH), b_val2d.dtype),
            pltpu.VMEM((_SR, CH), jnp.int32),
            pltpu.VMEM((_SR, CH), jnp.int32),
            pltpu.VMEM((_SR, CH), b_val2d.dtype),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((_CPB, 2)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={4: 0, 5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, metaf, b_col2d, b_val2d, row_init, key_init, val_init)
    return row2d.reshape(-1), key2d.reshape(-1), val2d.reshape(-1), cnt[0]


@functools.partial(jax.jit, static_argnames=("sr", "interpret"))
def expand_chunks(
    meta: jax.Array,
    metaf: jax.Array,
    b_col2d: jax.Array,
    b_val2d: jax.Array,
    sr: Semiring = PLUS_TIMES,
    *,
    interpret: bool = False,
):
    """Run the expansion kernel over all chunks.

    ``meta``/``metaf`` from :func:`build_chunk_meta` (chunk_cap rows, a
    multiple of _CPB).  ``b_col2d``/``b_val2d`` are the B tables reshaped to
    (rows, 128) **with one trailing padding row** (chunk DMAs read 2 rows).
    Returns (key, val) of shape (chunk_cap * 128,) — the chunk-padded packed
    expansion stream.
    """
    chunk_cap = meta.shape[0]
    assert chunk_cap % _CPB == 0, chunk_cap
    grid = (chunk_cap // _CPB,)
    key2d, val2d = pl.pallas_call(
        _expand_kernel(sr),
        out_shape=(
            jax.ShapeDtypeStruct((chunk_cap, CH), jnp.int32),
            jax.ShapeDtypeStruct((chunk_cap, CH), b_val2d.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_CPB, 8), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_CPB, 1), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((_CPB, CH), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CPB, CH), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((_CPB, 2, CH), jnp.int32),
            pltpu.VMEM((_CPB, 2, CH), b_val2d.dtype),
            pltpu.SemaphoreType.DMA((_CPB, 2)),
        ],
        interpret=interpret,
    )(meta, metaf, b_col2d, b_val2d)
    return key2d.reshape(-1), val2d.reshape(-1)
