"""Pallas-TPU compress kernel: sorted packed-key stream -> compacted segments.

The ESC back-end's compress stage (duplicate folding after the sort) costs
~1s per 50M products in XLA because segment_sum and the compaction scatters
run at TPU scatter rates (~100-200M el/s).  This kernel replaces all of it
with ONE sequential pass:

  per (TR, 128) tile of the sorted (key, val) stream:
    1. boundary flags from neighbor keys (lane/sublane rolls),
    2. segmented inclusive reduction via a log-step Hillis-Steele scan
       (flag-carrying, so segments never leak),
    3. cross-tile carry: the first segment continues the previous tile's
       last segment (carry key/value scalars live in SMEM scratch),
    4. survivors = segment-last elements with real keys (pads carry INT32_MAX
       keys and are never emitted),
    5. vectorized per-row compaction (lane cumsum + 7-step binary search),
    6. append rows into a VMEM staging buffer at the running fill offset
       (masked stores at dynamic positions), flushing full staging rows to
       the HBM outputs with manual DMAs.

The reference's counterpart is the k-way merge + duplicate folding of
``MultiwayMerge.h:412/537`` — pointer-walking there, a single streaming pass
here.  Output rows beyond the reported nnz contain garbage; the wrapper masks
them to sentinels (cheap).  If survivors exceed the output capacity the
writes clamp and nnz saturates at capacity, which callers treat as the
retry-with-bigger-buffer signal (``spgemm_auto``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from combblas_tpu.semiring import PLUS_TIMES, Semiring

__all__ = ["compress_sorted_packed_pallas", "compress_sorted_wide_pallas"]

_SENT = jnp.iinfo(jnp.int32).max
_TR = 256          # tile rows (tile = TR*128 elements)
_SR = 16           # staging rows; flush emits SR-1 full rows
_LANES = 128


def _combine(sr: Semiring):
    if sr.add_kind == "sum":
        return lambda a, b: a + b, 0.0
    if sr.add_kind == "min":
        return jnp.minimum, float("inf")
    return jnp.maximum, float("-inf")


def _shift_flat(x, d, fill):
    """x shifted by +d in flattened (row-major) order; shifted-in slots from
    before the tile take ``fill``.  d is a power of two."""
    tr = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    if d < _LANES:
        sv = pltpu.roll(x, d, 1)
        sv_rows = pltpu.roll(sv, 1, 0)
        out = jnp.where(lane < d, sv_rows, sv)
        return jnp.where((row == 0) & (lane < d), fill, out)
    dr = d // _LANES
    sv = pltpu.roll(x, dr, 0)
    return jnp.where(row < dr, fill, sv)


def _compress_kernel(sr: Semiring, out_rows: int, total_tiles: int):
    comb, ident = _combine(sr)

    def kernel(k_ref, v_ref, ok_ref, ov_ref, nnz_ref,
               stage_k, stage_v, scr_ck, scr_cv, scr_cnt, st, stf,
               sem_k, sem_v):
        # st: SMEM int32 [fc, out_row, carry_key]; stf: SMEM f32 [carry_val]
        b = pl.program_id(0)
        K = k_ref[:]
        V = v_ref[:].astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, K.shape, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, K.shape, 0)

        @pl.when(b == 0)
        def _():
            st[0] = 0            # staging fill count
            st[1] = 0            # output row cursor
            st[2] = -1           # carry key (matches no real key)
            stf[0] = ident

        carry_key = st[2]
        carry_val = stf[0]

        # -- boundary flags ------------------------------------------------
        prv = pltpu.roll(K, 1, 1)
        prv = jnp.where(lane == 0, pltpu.roll(prv, 1, 0), prv)
        prev_k = jnp.where((row == 0) & (lane == 0), carry_key, prv)
        is_new = K != prev_k
        nxt = pltpu.roll(K, _LANES - 1, 1)
        nxt = jnp.where(lane == _LANES - 1, pltpu.roll(nxt, _TR - 1, 0), nxt)
        is_last = (K != nxt) & ~((row == _TR - 1) & (lane == _LANES - 1))

        # -- segmented inclusive scan (flag-carrying; flags ride int32
        # because tpu.dynamic_rotate rejects i1 vectors) -------------------
        F = is_new.astype(jnp.int32)
        d = 1
        while d < _TR * _LANES:
            Vd = _shift_flat(V, d, jnp.float32(ident))
            # flag fill is 0, NOT 1: the value fill is the combine identity,
            # so crossing the tile edge is harmless, and a 1-fill would mark
            # the leading positions as boundary-seen and break the carry
            # continuation test below
            Fd = _shift_flat(F, d, 0)
            V = jnp.where(F > 0, V, comb(V, Vd))
            F = jnp.maximum(F, Fd)
            d *= 2
        # fold the previous tile's running segment into the leading segment
        cont = (F == 0) & (K == carry_key)
        V = jnp.where(cont, comb(V, carry_val), V)

        # -- survivors + per-row compaction --------------------------------
        surv = is_last & (K != _SENT)
        cs = surv.astype(jnp.int32)
        dd = 1
        while dd < _LANES:
            cs = cs + jnp.where(lane >= dd, pltpu.roll(cs, dd, 1), 0)
            dd *= 2
        cnt = jnp.take_along_axis(cs, jnp.full_like(lane, _LANES - 1), axis=1)
        opos = lane
        lo = jnp.zeros_like(opos)
        w = _LANES // 2
        while w >= 1:
            mid = lo + w - 1
            csm = jnp.take_along_axis(cs, jnp.minimum(mid, _LANES - 1),
                                      axis=1)
            lo = jnp.where(csm < opos + 1, mid + 1, lo)
            w //= 2
        src = jnp.minimum(lo, _LANES - 1)
        # stage compacted rows + counts in VMEM so the append loop can read
        # them with dynamic row indices (values cannot be dynamically sliced
        # in Mosaic; refs can)
        scr_ck[:] = jnp.take_along_axis(K, src, axis=1)
        scr_cv[:] = jnp.take_along_axis(V, src, axis=1)
        scr_cnt[:] = cnt

        # -- append machinery ----------------------------------------------
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        max_flush_row = out_rows - (_SR - 1)

        def maybe_flush():
            @pl.when(st[0] >= (_SR - 1) * _LANES)
            def _():
                orow = jnp.minimum(st[1], max_flush_row)
                dk = pltpu.make_async_copy(
                    stage_k.at[pl.ds(0, _SR - 1)],
                    ok_ref.at[pl.ds(orow, _SR - 1)], sem_k)
                dv = pltpu.make_async_copy(
                    stage_v.at[pl.ds(0, _SR - 1)],
                    ov_ref.at[pl.ds(orow, _SR - 1)], sem_v)
                dk.start(); dv.start(); dk.wait(); dv.wait()
                stage_k[0, :] = stage_k[_SR - 1, :]
                stage_v[0, :] = stage_v[_SR - 1, :]
                st[0] = st[0] - (_SR - 1) * _LANES
                st[1] = st[1] + (_SR - 1)

        def append_one(key_scalar, val_scalar):
            fc = st[0]
            fo = fc % _LANES
            ro = fc // _LANES
            m1 = lane1 == fo
            pltpu.store(stage_k.at[pl.ds(ro, 1), :],
                        jnp.full((1, _LANES), key_scalar, jnp.int32),
                        mask=m1)
            pltpu.store(stage_v.at[pl.ds(ro, 1), :],
                        jnp.full((1, _LANES), val_scalar, jnp.float32),
                        mask=m1)
            st[0] = fc + 1

        # A segment that ended exactly at the previous tile boundary has no
        # element here — emit the carried segment now if it does not continue.
        @pl.when((b > 0) & (K[0, 0] != carry_key) & (carry_key != -1)
                 & (carry_key != _SENT))
        def _():
            append_one(carry_key, carry_val)
            maybe_flush()

        # -- new carry = inclusive total of the tile's last segment --------
        st[2] = K[_TR - 1, _LANES - 1]
        stf[0] = V[_TR - 1, _LANES - 1]

        def append(r, _):
            c = jnp.sum(scr_cnt[pl.ds(r, 1), 0:1])

            @pl.when(c > 0)
            def _():
                fc = st[0]
                fo = fc % _LANES
                ro = fc // _LANES
                rk = pltpu.roll(scr_ck[pl.ds(r, 1), :], fo, 1)
                rv = pltpu.roll(scr_cv[pl.ds(r, 1), :], fo, 1)
                m1 = (lane1 >= fo) & (lane1 < fo + c)
                pltpu.store(stage_k.at[pl.ds(ro, 1), :], rk, mask=m1)
                pltpu.store(stage_v.at[pl.ds(ro, 1), :], rv, mask=m1)
                m2 = lane1 < (fo + c - _LANES)
                pltpu.store(stage_k.at[pl.ds(ro + 1, 1), :], rk, mask=m2)
                pltpu.store(stage_v.at[pl.ds(ro + 1, 1), :], rv, mask=m2)
                st[0] = fc + c

            maybe_flush()
            return 0

        jax.lax.fori_loop(0, _TR, append, 0)

        # -- final tile: flush remainder + report nnz ----------------------
        @pl.when(b == total_tiles - 1)
        def _():
            # emit the trailing open segment if it is real
            last_k = st[2]
            last_v = stf[0]

            @pl.when((last_k != _SENT) & (last_k != -1))
            def _():
                append_one(last_k, last_v)

            orow = jnp.minimum(st[1], out_rows - (_SR - 1))
            dk = pltpu.make_async_copy(
                stage_k.at[pl.ds(0, _SR - 1)],
                ok_ref.at[pl.ds(orow, _SR - 1)], sem_k)
            dv = pltpu.make_async_copy(
                stage_v.at[pl.ds(0, _SR - 1)],
                ov_ref.at[pl.ds(orow, _SR - 1)], sem_v)
            dk.start(); dv.start(); dk.wait(); dv.wait()
            nnz_ref[0] = st[1] * _LANES + st[0]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("sr", "out_capacity", "interpret")
)
def compress_sorted_packed_pallas(
    key: jax.Array,
    val: jax.Array,
    sr: Semiring = PLUS_TIMES,
    *,
    out_capacity: int,
    interpret: bool = False,
):
    """Compress a SORTED packed-key stream (pads = INT32_MAX) into compacted
    (key, val, nnz).  ``key.shape[0]`` and ``out_capacity`` must be multiples
    of 128 (and the stream a multiple of TR*128 = 32768 — callers pad with
    sentinel keys).  Returns (out_key int32[out_capacity], out_val
    f32[out_capacity], nnz int32); entries past nnz are INT32_MAX / 0."""
    n = key.shape[0]
    tile = _TR * _LANES
    assert n % tile == 0, n
    assert out_capacity % _LANES == 0, out_capacity
    assert out_capacity >= _SR * _LANES, out_capacity
    # allocate SR-1 slack rows: every flush (including the final one) writes
    # a fixed SR-1 rows, and without slack a final flush near the capacity
    # edge would clamp backwards and overwrite earlier output rows
    out_rows = out_capacity // _LANES + (_SR - 1)
    total_tiles = n // tile
    k2d = key.reshape(-1, _LANES)
    v2d = val.astype(jnp.float32).reshape(-1, _LANES)
    ok, ov, nnz = pl.pallas_call(
        _compress_kernel(sr, out_rows, total_tiles),
        out_shape=(
            jax.ShapeDtypeStruct((out_rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((out_rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        grid=(total_tiles,),
        in_specs=[
            pl.BlockSpec((_TR, _LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, _LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((_SR, _LANES), jnp.int32),
            pltpu.VMEM((_SR, _LANES), jnp.float32),
            pltpu.VMEM((_TR, _LANES), jnp.int32),
            pltpu.VMEM((_TR, _LANES), jnp.float32),
            pltpu.VMEM((_TR, _LANES), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(k2d, v2d)
    nnz_s = jnp.minimum(nnz[0], out_capacity)
    t = jnp.arange(out_capacity, dtype=jnp.int32)
    okf = jnp.where(t < nnz_s, ok.reshape(-1)[:out_capacity], _SENT)
    ovf = jnp.where(t < nnz_s, ov.reshape(-1)[:out_capacity], 0.0).astype(
        val.dtype)
    return okf, ovf, nnz_s


def _compress_wide_kernel(sr: Semiring, out_rows: int, total_tiles: int):
    """Wide-key compress: identical single-pass structure to
    :func:`_compress_kernel`, but the sort key is the PAIR of int32 streams
    (hi=row, lo=col) — segment boundaries are pairwise inequality, the
    cross-tile carry holds both halves, and the compacted output is three
    streams.  Needed once packed keys overflow int32 (scale >= 19 square
    R-MAT A²); pads carry hi == lo == INT32_MAX."""
    comb, ident = _combine(sr)

    def kernel(h_ref, l_ref, v_ref, oh_ref, ol_ref, ov_ref, nnz_ref,
               stage_h, stage_l, stage_v, scr_ch, scr_cl, scr_cv, scr_cnt,
               st, stf, sem_h, sem_l, sem_v):
        # st: SMEM int32 [fc, out_row, carry_hi, carry_lo]; stf: [carry_val]
        b = pl.program_id(0)
        H = h_ref[:]
        L = l_ref[:]
        V = v_ref[:].astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, H.shape, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, H.shape, 0)

        @pl.when(b == 0)
        def _():
            st[0] = 0            # staging fill count
            st[1] = 0            # output row cursor
            st[2] = -1           # carry hi (matches no real row)
            st[3] = -1           # carry lo
            stf[0] = ident

        carry_hi = st[2]
        carry_lo = st[3]
        carry_val = stf[0]

        # -- boundary flags (pairwise) --------------------------------------
        def prev_of(K, carry):
            prv = pltpu.roll(K, 1, 1)
            prv = jnp.where(lane == 0, pltpu.roll(prv, 1, 0), prv)
            return jnp.where((row == 0) & (lane == 0), carry, prv)

        def next_of(K):
            nxt = pltpu.roll(K, _LANES - 1, 1)
            return jnp.where(lane == _LANES - 1, pltpu.roll(nxt, _TR - 1, 0),
                             nxt)

        is_new = (H != prev_of(H, carry_hi)) | (L != prev_of(L, carry_lo))
        not_edge = ~((row == _TR - 1) & (lane == _LANES - 1))
        is_last = ((H != next_of(H)) | (L != next_of(L))) & not_edge

        # -- segmented inclusive scan ---------------------------------------
        F = is_new.astype(jnp.int32)
        d = 1
        while d < _TR * _LANES:
            Vd = _shift_flat(V, d, jnp.float32(ident))
            Fd = _shift_flat(F, d, 0)
            V = jnp.where(F > 0, V, comb(V, Vd))
            F = jnp.maximum(F, Fd)
            d *= 2
        cont = (F == 0) & (H == carry_hi) & (L == carry_lo)
        V = jnp.where(cont, comb(V, carry_val), V)

        # -- survivors + per-row compaction ---------------------------------
        surv = is_last & (H != _SENT)
        cs = surv.astype(jnp.int32)
        dd = 1
        while dd < _LANES:
            cs = cs + jnp.where(lane >= dd, pltpu.roll(cs, dd, 1), 0)
            dd *= 2
        cnt = jnp.take_along_axis(cs, jnp.full_like(lane, _LANES - 1), axis=1)
        opos = lane
        lo_ix = jnp.zeros_like(opos)
        w = _LANES // 2
        while w >= 1:
            mid = lo_ix + w - 1
            csm = jnp.take_along_axis(cs, jnp.minimum(mid, _LANES - 1),
                                      axis=1)
            lo_ix = jnp.where(csm < opos + 1, mid + 1, lo_ix)
            w //= 2
        src = jnp.minimum(lo_ix, _LANES - 1)
        scr_ch[:] = jnp.take_along_axis(H, src, axis=1)
        scr_cl[:] = jnp.take_along_axis(L, src, axis=1)
        scr_cv[:] = jnp.take_along_axis(V, src, axis=1)
        scr_cnt[:] = cnt

        # -- append machinery -----------------------------------------------
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        max_flush_row = out_rows - (_SR - 1)

        def maybe_flush():
            @pl.when(st[0] >= (_SR - 1) * _LANES)
            def _():
                orow = jnp.minimum(st[1], max_flush_row)
                dh = pltpu.make_async_copy(
                    stage_h.at[pl.ds(0, _SR - 1)],
                    oh_ref.at[pl.ds(orow, _SR - 1)], sem_h)
                dl = pltpu.make_async_copy(
                    stage_l.at[pl.ds(0, _SR - 1)],
                    ol_ref.at[pl.ds(orow, _SR - 1)], sem_l)
                dv = pltpu.make_async_copy(
                    stage_v.at[pl.ds(0, _SR - 1)],
                    ov_ref.at[pl.ds(orow, _SR - 1)], sem_v)
                dh.start(); dl.start(); dv.start()
                dh.wait(); dl.wait(); dv.wait()
                stage_h[0, :] = stage_h[_SR - 1, :]
                stage_l[0, :] = stage_l[_SR - 1, :]
                stage_v[0, :] = stage_v[_SR - 1, :]
                st[0] = st[0] - (_SR - 1) * _LANES
                st[1] = st[1] + (_SR - 1)

        def append_one(hi_scalar, lo_scalar, val_scalar):
            fc = st[0]
            fo = fc % _LANES
            ro = fc // _LANES
            m1 = lane1 == fo
            pltpu.store(stage_h.at[pl.ds(ro, 1), :],
                        jnp.full((1, _LANES), hi_scalar, jnp.int32), mask=m1)
            pltpu.store(stage_l.at[pl.ds(ro, 1), :],
                        jnp.full((1, _LANES), lo_scalar, jnp.int32), mask=m1)
            pltpu.store(stage_v.at[pl.ds(ro, 1), :],
                        jnp.full((1, _LANES), val_scalar, jnp.float32),
                        mask=m1)
            st[0] = fc + 1

        # a segment that ended exactly at the previous tile boundary
        @pl.when((b > 0) & (carry_hi != -1) & (carry_hi != _SENT)
                 & ((H[0, 0] != carry_hi) | (L[0, 0] != carry_lo)))
        def _():
            append_one(carry_hi, carry_lo, carry_val)
            maybe_flush()

        st[2] = H[_TR - 1, _LANES - 1]
        st[3] = L[_TR - 1, _LANES - 1]
        stf[0] = V[_TR - 1, _LANES - 1]

        def append(r, _):
            c = jnp.sum(scr_cnt[pl.ds(r, 1), 0:1])

            @pl.when(c > 0)
            def _():
                fc = st[0]
                fo = fc % _LANES
                ro = fc // _LANES
                rh = pltpu.roll(scr_ch[pl.ds(r, 1), :], fo, 1)
                rl = pltpu.roll(scr_cl[pl.ds(r, 1), :], fo, 1)
                rv = pltpu.roll(scr_cv[pl.ds(r, 1), :], fo, 1)
                m1 = (lane1 >= fo) & (lane1 < fo + c)
                pltpu.store(stage_h.at[pl.ds(ro, 1), :], rh, mask=m1)
                pltpu.store(stage_l.at[pl.ds(ro, 1), :], rl, mask=m1)
                pltpu.store(stage_v.at[pl.ds(ro, 1), :], rv, mask=m1)
                m2 = lane1 < (fo + c - _LANES)
                pltpu.store(stage_h.at[pl.ds(ro + 1, 1), :], rh, mask=m2)
                pltpu.store(stage_l.at[pl.ds(ro + 1, 1), :], rl, mask=m2)
                pltpu.store(stage_v.at[pl.ds(ro + 1, 1), :], rv, mask=m2)
                st[0] = fc + c

            maybe_flush()
            return 0

        jax.lax.fori_loop(0, _TR, append, 0)

        @pl.when(b == total_tiles - 1)
        def _():
            last_h = st[2]
            last_l = st[3]
            last_v = stf[0]

            @pl.when((last_h != _SENT) & (last_h != -1))
            def _():
                append_one(last_h, last_l, last_v)

            orow = jnp.minimum(st[1], out_rows - (_SR - 1))
            dh = pltpu.make_async_copy(
                stage_h.at[pl.ds(0, _SR - 1)],
                oh_ref.at[pl.ds(orow, _SR - 1)], sem_h)
            dl = pltpu.make_async_copy(
                stage_l.at[pl.ds(0, _SR - 1)],
                ol_ref.at[pl.ds(orow, _SR - 1)], sem_l)
            dv = pltpu.make_async_copy(
                stage_v.at[pl.ds(0, _SR - 1)],
                ov_ref.at[pl.ds(orow, _SR - 1)], sem_v)
            dh.start(); dl.start(); dv.start()
            dh.wait(); dl.wait(); dv.wait()
            nnz_ref[0] = st[1] * _LANES + st[0]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("sr", "out_capacity", "interpret")
)
def compress_sorted_wide_pallas(
    hi: jax.Array,
    lo: jax.Array,
    val: jax.Array,
    sr: Semiring = PLUS_TIMES,
    *,
    out_capacity: int,
    interpret: bool = False,
):
    """Compress a stream SORTED by the key pair (hi, lo) — from
    ``jax.lax.sort((hi, lo, val), num_keys=2)``, pads = (INT32_MAX,
    INT32_MAX) — into compacted (hi, lo, val, nnz).  Stream length must be a
    multiple of TR*128 = 32768 and ``out_capacity`` a multiple of 128.
    Entries past nnz are INT32_MAX / INT32_MAX / 0."""
    n = hi.shape[0]
    tile = _TR * _LANES
    assert n % tile == 0, n
    assert out_capacity % _LANES == 0, out_capacity
    assert out_capacity >= _SR * _LANES, out_capacity
    out_rows = out_capacity // _LANES + (_SR - 1)
    total_tiles = n // tile
    h2d = hi.reshape(-1, _LANES)
    l2d = lo.reshape(-1, _LANES)
    v2d = val.astype(jnp.float32).reshape(-1, _LANES)
    oh, ol, ov, nnz = pl.pallas_call(
        _compress_wide_kernel(sr, out_rows, total_tiles),
        out_shape=(
            jax.ShapeDtypeStruct((out_rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((out_rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((out_rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        grid=(total_tiles,),
        in_specs=[
            pl.BlockSpec((_TR, _LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, _LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, _LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((_SR, _LANES), jnp.int32),
            pltpu.VMEM((_SR, _LANES), jnp.int32),
            pltpu.VMEM((_SR, _LANES), jnp.float32),
            pltpu.VMEM((_TR, _LANES), jnp.int32),
            pltpu.VMEM((_TR, _LANES), jnp.int32),
            pltpu.VMEM((_TR, _LANES), jnp.float32),
            pltpu.VMEM((_TR, _LANES), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(h2d, l2d, v2d)
    nnz_s = jnp.minimum(nnz[0], out_capacity)
    t = jnp.arange(out_capacity, dtype=jnp.int32)
    live = t < nnz_s
    ohf = jnp.where(live, oh.reshape(-1)[:out_capacity], _SENT)
    olf = jnp.where(live, ol.reshape(-1)[:out_capacity], _SENT)
    ovf = jnp.where(live, ov.reshape(-1)[:out_capacity], 0.0).astype(
        val.dtype)
    return ohf, olf, ovf, nnz_s
