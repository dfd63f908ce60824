"""2D-blocked degree-sorted ELL-8 SpMM/SpMV-batch kernel: y = A (.) X.

Extends :mod:`spmm_ell` past the VMEM-residency limit: X is partitioned
into column blocks and Y into row blocks, each VMEM-sized.  The grid is
``(row_block, col_block, tile)`` with AFFINE BlockSpec index maps — the
Y window is held in VMEM across a whole row-block sweep and each X window
is fetched exactly once per (row, col) block pair.  (A first cut used
scalar-prefetched per-tile block tables; Mosaic cannot prove a
table-driven window unchanged between tiles, so it conservatively
restreamed both windows EVERY tile — ~70 GB per sweep.  Affine maps fix
that, and segment balance makes the padded-to-common-tile-count grid
cheap.)

Rows are relabeled **block-interleaved by degree**: sorted rank r maps to
block r % nb at local slot r // nb.  Every row block then carries the
same degree profile, so per-(row,col)-block position streams are balanced
(within a few %) and padding each to the common tile count costs ~10 %.
Groups of 8 local-consecutive rows stay near-sorted (ranks nb apart), so
ELL window padding stays small.

Per (group, col-block) run the accumulator flushes with a
read-modify-write fold (sum or max) into the Y block; the first tile of
each row block zeroes it.  The ``max`` fold (non-negative values) is the
``SelectMaxSRing``-style reduction BFS pulls need (``BFSFriends.h:458``):
one sweep per level computes every vertex's max (id+1) over frontier
neighbors — hit detection and parent choice in a single fused op.

Reference counterparts: ``Friends.h:64`` (dcsc_gespmv) for the sum fold,
``BFSFriends.h:328/458`` for the max/BFS use.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from combblas_tpu.ops.coo import SpCOO

__all__ = ["ell_blocked_prepare", "spmm_ell_blocked"]

_TP = 1024  # positions per grid tile (x8 entries); matches XLA T(1024)


def ell_blocked_prepare(a: SpCOO, nb: int = 6, *, relabel_cols: bool = False,
                        binary: bool = False):
    """Host-side blocked ELL-8 plan.

    ``relabel_cols``: also rename columns by the block-interleaved degree
    order (square symmetric operands only) — X/Y then live in the
    relabeled space and no per-call unpermute is needed (the BFS loop's
    mode).  ``binary`` replaces values with 1.0 (pattern semiring).
    Returns a dict of device arrays + statics."""
    m, n = a.shape
    if relabel_cols:
        assert m == n, "relabel_cols needs a square operand"
    nnz = int(a.nnz)
    row = np.asarray(a.row)[:nnz]
    col = np.asarray(a.col)[:nnz]
    val = (np.ones(nnz, np.float32) if binary
           else np.asarray(a.val)[:nnz].astype(np.float32))
    deg = np.bincount(row, minlength=m).astype(np.int64)
    srt = np.argsort(-deg, kind="stable")
    rank0 = np.empty(m, np.int64)
    rank0[srt] = np.arange(m)

    bs_r = -(-m // (8 * nb)) * 8          # row-block size (multiple of 8)
    m_pad = bs_r * nb
    G_rb = bs_r // 8                      # groups per row block
    # block-interleaved relabeling: sorted rank r -> block r%nb, slot r//nb
    rank = (rank0 % nb) * bs_r + rank0 // nb
    order = np.empty(m_pad, np.int64)     # relabeled id -> original id
    order.fill(-1)
    order[rank] = np.arange(m)
    bs_c = (bs_r if relabel_cols
            else -(-n // (8 * nb)) * 8)
    n_pad = bs_c * nb

    e_r = rank[row]                                    # relabeled row id
    e_c = rank[col] if relabel_cols else col.astype(np.int64)
    cb_e = e_c // bs_c
    # local degree per (relabeled row, col block)
    key = e_r * nb + cb_e
    ldeg = np.bincount(key, minlength=m_pad * nb).reshape(m_pad, nb)
    G = m_pad // 8
    Lgc = ldeg.reshape(G, 8, nb).max(axis=1)           # (G, nb)
    # segment (rb, cb): groups rb*G_rb..(rb+1)*G_rb-1 at col block cb
    lens = Lgc.reshape(nb, G_rb, nb).transpose(0, 2, 1).reshape(-1)
    lens2 = lens.reshape(nb * nb, G_rb)
    seg_tot = lens2.sum(axis=1)
    t_seg = int(max(-(-int(seg_tot.max()) // _TP), 1))  # tiles per segment
    seg_cap = t_seg * _TP
    Ppad = seg_cap * nb * nb
    innerpfx = np.cumsum(lens2, axis=1) - lens2
    seg_off = np.arange(nb * nb, dtype=np.int64) * seg_cap
    g_start = (seg_off[:, None] + innerpfx).reshape(-1)

    cols_a = np.zeros((8, Ppad), np.int32)
    vals_a = np.zeros((8, Ppad), np.float32)
    flush = np.zeros((Ppad,), np.int32)
    base = np.zeros((Ppad,), np.int32)
    # entry destinations: sort entries by (relabeled row, col block),
    # preserving within-row order
    sort_idx = np.argsort(key, kind="stable")
    key_s = key[sort_idx]
    first = np.ones(nnz, bool)
    first[1:] = key_s[1:] != key_s[:-1]
    grp_head = np.flatnonzero(first)
    within = np.arange(nnz) - np.repeat(
        grp_head, np.diff(np.concatenate([grp_head, [nnz]])))
    er_s = e_r[sort_idx]
    cb_s = cb_e[sort_idx]
    g_s = er_s >> 3
    seg_idx_of_g = (g_s // G_rb) * (nb * G_rb) + cb_s * G_rb + (g_s % G_rb)
    dest_p = g_start[seg_idx_of_g] + within
    dest_i = er_s & 7
    cols_a[dest_i, dest_p] = (e_c[sort_idx] - cb_s * bs_c).astype(np.int32)
    vals_a[dest_i, dest_p] = val[sort_idx]
    # flush at the last position of every (g, cb) with entries
    live_seg = lens > 0
    last_pos = (g_start + lens - 1)[live_seg]
    flush[last_pos] = 1
    g_local = (np.arange(nb * nb * G_rb) % G_rb)
    base[last_pos] = (g_local[live_seg] * 8).astype(np.int32)

    inv = rank  # original id -> relabeled id
    return dict(
        cols=jnp.asarray(cols_a), vals=jnp.asarray(vals_a),
        flush=jnp.asarray(flush), base=jnp.asarray(base),
        order=jnp.asarray(order, jnp.int32),
        inv=jnp.asarray(inv, jnp.int32),
        live=jnp.asarray(deg > 0),
        P=Ppad, t_seg=t_seg, nb=nb, bs_r=bs_r, bs_c=bs_c,
        m_pad=m_pad, n_pad=n_pad, relabel_cols=relabel_cols,
    )


def _ell_blocked_kernel(d: int, op: str):
    fold = jnp.maximum if op == "max" else (lambda a, b: a + b)

    def kernel(col_ref, flush_ref, base_ref, val_ref, x_ref, out_ref,
               acc_ref):
        @pl.when((pl.program_id(1) == 0) & (pl.program_id(2) == 0))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def pos(p, acc):
            xg = jnp.concatenate(
                [x_ref[pl.ds(col_ref[i, p], 1), :] * val_ref[i, p]
                 for i in range(8)],
                axis=0)
            acc = fold(acc, xg)

            @pl.when(flush_ref[p] == 1)
            def _():
                loc = pl.multiple_of(base_ref[p], 8)
                out_ref[pl.ds(loc, 8), :] = fold(
                    out_ref[pl.ds(loc, 8), :], acc)

            acc = jnp.where(flush_ref[p] == 1, jnp.zeros_like(acc), acc)
            return acc

        acc_ref[:] = jax.lax.fori_loop(0, _TP, pos, acc_ref[:])

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "t_seg", "nb", "bs_r", "bs_c", "m_pad", "n_pad", "op", "interpret"))
def _ell_blocked_call(cols, vals, flush, base, x, *,
                      t_seg: int, nb: int, bs_r: int, bs_c: int,
                      m_pad: int, n_pad: int, op: str = "sum",
                      interpret: bool = False):
    d = x.shape[1]

    def tile_idx(i, j, t):
        return (i * nb + j) * t_seg + t

    return pl.pallas_call(
        _ell_blocked_kernel(d, op),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), jnp.float32),
        grid=(nb, nb, t_seg),
        in_specs=[
            pl.BlockSpec((8, _TP), lambda i, j, t: (0, tile_idx(i, j, t)),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TP,), lambda i, j, t: (tile_idx(i, j, t),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TP,), lambda i, j, t: (tile_idx(i, j, t),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, _TP), lambda i, j, t: (0, tile_idx(i, j, t)),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bs_c, d), lambda i, j, t: (j, 0)),
        ],
        out_specs=pl.BlockSpec((bs_r, d), lambda i, j, t: (i, 0)),
        scratch_shapes=[pltpu.VMEM((8, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(cols, flush, base, vals, x)


def spmm_ell_blocked(a: SpCOO, x: jax.Array, prep=None, *, nb: int = 6,
                     op: str = "sum", interpret: bool = False) -> jax.Array:
    """y = A @ X through the 2D-blocked ELL-8 kernel (sum fold); use
    ``op="max"`` for the non-negative max fold.  Handles operands whose
    X/Y exceed VMEM.  Output is unpermuted to the original row order
    (``relabel_cols`` preps skip that and stay in relabeled space)."""
    m, n = a.shape
    d = x.shape[1]
    if prep is None:
        prep = ell_blocked_prepare(a, nb)
    dp = -(-d // 128) * 128
    xp = x.astype(jnp.float32)
    if dp != d:
        xp = jnp.concatenate(
            [xp, jnp.zeros((x.shape[0], dp - d), jnp.float32)], axis=1)
    if xp.shape[0] != prep["n_pad"]:
        xp = jnp.concatenate(
            [xp, jnp.zeros((prep["n_pad"] - xp.shape[0], dp),
                           jnp.float32)], axis=0)
    y_perm = _ell_blocked_call(
        prep["cols"], prep["vals"], prep["flush"], prep["base"], xp,
        t_seg=prep["t_seg"], nb=prep["nb"], bs_r=prep["bs_r"],
        bs_c=prep["bs_c"], m_pad=prep["m_pad"], n_pad=prep["n_pad"],
        op=op, interpret=interpret)
    if prep["relabel_cols"]:
        return y_perm[:, :d].astype(x.dtype)
    y = jnp.where(prep["live"][:, None],
                  jnp.take(y_perm, prep["inv"], axis=0), 0.0)
    return y[:, :d].astype(x.dtype)
