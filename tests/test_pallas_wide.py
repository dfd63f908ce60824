"""Wide-key (dual int32 row/col streams) Pallas SpGEMM pipeline — the
large-scale path used once packed m*n keys overflow int32 (square R-MAT A²
at scale >= 19; reference runs these shapes with IT=int64_t,
``mtSpGEMM.h:214``).  Interpret mode under the CPU test mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from combblas_tpu.ops.coo import SpCOO
from combblas_tpu.ops.spgemm import (
    spgemm_auto,
    spgemm_pallas_bounds,
    spgemm_pallas_rowchunked,
    spgemm_pallas_streamed,
    spgemm_pallas_wide,
    stream_capacity,
    spgemm_flops,
)
from combblas_tpu.semiring import MIN_PLUS, PLUS_TIMES


def _rand(m, k, density, seed):
    rng = np.random.default_rng(seed)
    d = (rng.random((m, k)) < density) * rng.random((m, k))
    return d.astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("density", [0.03, 0.15])
def test_wide_matches_dense(seed, density):
    m, k, n = 96, 80, 64
    ad = _rand(m, k, density, seed)
    bd = _rand(k, n, density, seed + 10)
    a = SpCOO.from_dense(ad)
    b = SpCOO.from_dense(bd)
    chunk_cap, out_cap = spgemm_pallas_bounds(a, b)
    scap = stream_capacity(int(spgemm_flops(a, b)))
    c = spgemm_pallas_wide(a, b, PLUS_TIMES, chunk_cap=chunk_cap,
                           out_capacity=out_cap, stream_cap=scap,
                           interpret=True)
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), ad @ bd, rtol=1e-5, atol=1e-5
    )


def test_wide_minplus_semiring():
    m = k = n = 48
    ad = _rand(m, k, 0.1, 3)
    bd = _rand(k, n, 0.1, 4)
    a = SpCOO.from_dense(ad)
    b = SpCOO.from_dense(bd)
    chunk_cap, out_cap = spgemm_pallas_bounds(a, b)
    scap = stream_capacity(int(spgemm_flops(a, b)))
    cw = spgemm_pallas_wide(a, b, MIN_PLUS, chunk_cap=chunk_cap,
                            out_capacity=out_cap, stream_cap=scap,
                            interpret=True)
    cx = spgemm_auto(a, b, MIN_PLUS)
    np.testing.assert_allclose(
        np.asarray(cw.to_dense()), np.asarray(cx.to_dense()), rtol=1e-6
    )


def test_wide_rowchunked_matches_dense():
    m = k = n = 120
    ad = _rand(m, k, 0.08, 7)
    bd = _rand(k, n, 0.08, 8)
    a = SpCOO.from_dense(ad)
    b = SpCOO.from_dense(bd)
    c = spgemm_pallas_rowchunked(a, b, PLUS_TIMES, num_slabs=4,
                                 out_capacity=1 << 14, wide=True,
                                 interpret=True)
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), ad @ bd, rtol=1e-5, atol=1e-5
    )


def test_wide_streamed_digest_matches():
    """The non-materializing digest equals the materialized product's
    (nnz, value-sum)."""
    m = k = n = 100
    ad = _rand(m, k, 0.1, 11)
    bd = _rand(k, n, 0.1, 12)
    a = SpCOO.from_dense(ad)
    b = SpCOO.from_dense(bd)
    total, checksum, truncated = spgemm_pallas_streamed(
        a, b, PLUS_TIMES, num_slabs=3, wide=True, interpret=True)
    cd = ad @ bd
    assert not bool(truncated)
    assert int(total) == int((cd != 0).sum())
    np.testing.assert_allclose(float(checksum), float(cd.sum()), rtol=1e-4)


def test_wide_compress_multitile_carry():
    """Pair-key segments spanning the 32768-element tile boundary fold the
    carried (hi, lo, val) exactly."""
    from combblas_tpu.ops.pallas.compress_kernel import (
        compress_sorted_wide_pallas,
    )

    tile = 32768
    n = 2 * tile
    sent = np.iinfo(np.int32).max
    hi = np.zeros((n,), np.int32)
    lo = np.zeros((n,), np.int32)
    val = np.ones((n,), np.float32)
    # one long segment spanning the boundary, then a run of distinct pairs,
    # then pads
    hi[: tile + 100] = 5
    lo[: tile + 100] = 7
    k = tile + 100
    distinct = 300
    hi[k: k + distinct] = 6
    lo[k: k + distinct] = np.arange(distinct)
    hi[k + distinct:] = sent
    lo[k + distinct:] = sent
    val[k + distinct:] = 0
    oh, ol, ov, nnz = compress_sorted_wide_pallas(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(val), PLUS_TIMES,
        out_capacity=4096, interpret=True)
    assert int(nnz) == 1 + distinct
    oh, ol, ov = (np.asarray(x)[: int(nnz)] for x in (oh, ol, ov))
    assert oh[0] == 5 and ol[0] == 7 and ov[0] == tile + 100
    np.testing.assert_array_equal(oh[1:], np.full(distinct, 6))
    np.testing.assert_array_equal(ol[1:], np.arange(distinct))
    np.testing.assert_array_equal(ov[1:], np.ones(distinct))


def test_wide_same_col_adjacent_rows():
    """Adjacent rows ending/starting on the SAME column must not merge —
    the failure mode a single lo-only key would have."""
    m = k = n = 8
    ad = np.zeros((m, k), np.float32)
    bd = np.zeros((k, n), np.float32)
    ad[0, 1] = 1.0
    ad[1, 2] = 2.0
    bd[1, 7] = 3.0   # row 0 -> (0,7)
    bd[2, 7] = 4.0   # row 1 -> (1,7): same col, adjacent in (row,col) order
    a = SpCOO.from_dense(ad)
    b = SpCOO.from_dense(bd)
    chunk_cap, out_cap = spgemm_pallas_bounds(a, b)
    scap = stream_capacity(int(spgemm_flops(a, b)))
    c = spgemm_pallas_wide(a, b, PLUS_TIMES, chunk_cap=chunk_cap,
                           out_capacity=out_cap, stream_cap=scap,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(c.to_dense()), ad @ bd)
    assert int(c.nnz) == 2


def test_summa_pallas_impl_matches_xla():
    """SUMMA with the Pallas local pipeline (interpret mode on the CPU mesh)
    equals the XLA-impl product — VERDICT item: kernels inside shard_map."""
    from combblas_tpu.parallel.dist import DistSpMat
    from combblas_tpu.parallel.grid import ProcGrid
    from combblas_tpu.parallel.summa import (
        summa_bounds,
        summa_chunk_bound,
        summa_spgemm,
    )

    grid = ProcGrid.make(2, 2, devices=jax.devices()[:4])
    m = 40
    ad = _rand(m, m, 0.12, 21)
    bd = _rand(m, m, 0.12, 22)
    A = DistSpMat.from_local(SpCOO.from_dense(ad), grid)
    B = DistSpMat.from_local(SpCOO.from_dense(bd), grid)
    fc, oc = summa_bounds(A, B)
    ck = summa_chunk_bound(A, B, fc)
    for impl in ("pallas", "wide"):
        c = summa_spgemm(A, B, flops_cap=fc, out_capacity=oc, impl=impl,
                         chunk_cap=ck, interpret=True)
        np.testing.assert_allclose(np.asarray(c.to_dense()), ad @ bd,
                                   rtol=1e-5, atol=1e-5)
