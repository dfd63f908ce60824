"""Segmented (row-classed) ESC pipeline — digest correctness against dense
references and the flat streamed path, interpret mode on the CPU mesh.

Mirrors the reference's cross-implementation equivalence testing style
(``MultTest.cpp:120-230``: every new execution variant is checked against
an independently computed product)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from combblas_tpu.ops.coo import SpCOO
from combblas_tpu.ops.spgemm import spgemm_pallas_streamed
from combblas_tpu.ops.spgemm_seg import seg_plan, spgemm_streamed_seg
from combblas_tpu.semiring import PLUS_TIMES


def _rand(m, k, density, seed):
    rng = np.random.default_rng(seed)
    d = (rng.random((m, k)) < density) * rng.random((m, k))
    return d.astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("density", [0.04, 0.15])
def test_seg_digest_matches_dense(seed, density):
    m, k, n = 96, 80, 64
    ad = _rand(m, k, density, seed)
    bd = _rand(k, n, density, seed + 10)
    a = SpCOO.from_dense(ad)
    b = SpCOO.from_dense(bd)
    nnz, cks, trunc = spgemm_streamed_seg(a, b, PLUS_TIMES, num_slabs=3,
                                          interpret=True)
    ref = ad.astype(np.float64) @ bd.astype(np.float64)
    assert not bool(trunc)
    assert nnz == int((ref != 0).sum())
    np.testing.assert_allclose(cks, ref.sum(), rtol=1e-4)


def test_seg_matches_flat_streamed_skewed():
    # power-law-ish skew: a few hub rows with large windows, many tiny rows
    rng = np.random.default_rng(7)
    m = k = n = 200
    ad = np.zeros((m, k), np.float32)
    for i in range(m):
        deg = min(int(rng.pareto(0.7) + 1), k)
        cols = rng.choice(k, size=deg, replace=False)
        ad[i, cols] = rng.random(deg).astype(np.float32) + 0.1
    bd = (rng.random((k, n)) < 0.2).astype(np.float32) * 0.5
    a = SpCOO.from_dense(ad)
    b = SpCOO.from_dense(bd)
    nnz_s, cks_s, tr_s = spgemm_streamed_seg(a, b, PLUS_TIMES, num_slabs=4,
                                             interpret=True)
    nnz_f, cks_f, tr_f = spgemm_pallas_streamed(a, b, PLUS_TIMES,
                                                num_slabs=4, wide=True,
                                                interpret=True)
    assert not bool(tr_s) and not bool(tr_f)
    assert nnz_s == nnz_f
    np.testing.assert_allclose(float(cks_s), float(cks_f), rtol=1e-5)


def test_seg_plan_caps_cover_every_slab_row():
    # the plan's class capacities must fit the realized per-slab row counts
    rng = np.random.default_rng(3)
    m = k = 150
    ad = (rng.random((m, k)) < 0.08).astype(np.float32)
    a = SpCOO.from_dense(ad)
    plan = seg_plan(a, a, 5)
    bounds = np.asarray(plan["bounds"])
    classes = plan["classes"]
    s_caps = plan["s_caps"]
    deg = np.asarray(jnp.bincount(jnp.asarray(a.row)[: int(a.nnz)],
                                  length=m))
    col = np.asarray(a.col)[: int(a.nnz)]
    rowfl = np.bincount(np.asarray(a.row)[: int(a.nnz)],
                        weights=deg[col].astype(np.float64),
                        minlength=m)
    nz = rowfl > 0
    # classes are half-octave widths; a row's window must STRICTLY exceed
    # its flops (the trailing-sentinel guarantee)
    widths = np.asarray(classes)
    assert np.all(np.diff(widths) > 0)
    assert widths[-1] > rowfl.max()
    cls = np.searchsorted(widths, rowfl, side="right")
    for s in range(len(bounds) - 1):
        lo, hi = bounds[s], bounds[s + 1]
        for i, w in enumerate(classes):
            cnt = int(((cls[lo:hi] == i) & nz[lo:hi]).sum())
            assert cnt <= s_caps[i], (s, w, cnt, s_caps[i])
            sel = (cls[lo:hi] == i) & nz[lo:hi]
            if sel.any():
                assert rowfl[lo:hi][sel].max() < w


def test_seg_single_slab_tiny():
    ad = np.array([[1.0, 2.0, 0.0], [0.0, 3.0, 4.0], [5.0, 0.0, 6.0]],
                  np.float32)
    a = SpCOO.from_dense(ad)
    nnz, cks, trunc = spgemm_streamed_seg(a, a, PLUS_TIMES, num_slabs=1,
                                          interpret=True)
    ref = ad @ ad
    assert nnz == int((ref != 0).sum())
    np.testing.assert_allclose(cks, ref.sum(), rtol=1e-5)
    assert not bool(trunc)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("density", [0.04, 0.15])
def test_seg2_digest_matches_dense(seed, density):
    from combblas_tpu.ops.spgemm_seg import spgemm_streamed_seg2

    m, k, n = 96, 80, 64
    ad = _rand(m, k, density, seed)
    bd = _rand(k, n, density, seed + 10)
    a = SpCOO.from_dense(ad)
    b = SpCOO.from_dense(bd)
    # tiny budgets force several slabs + at least one mid-class cut
    nnz, cks, trunc = spgemm_streamed_seg2(
        a, b, PLUS_TIMES, flops_cap=1 << 12, pad_cap=1 << 16,
        interpret=True)
    ref = ad.astype(np.float64) @ bd.astype(np.float64)
    assert not bool(trunc)
    assert nnz == int((ref != 0).sum())
    np.testing.assert_allclose(cks, ref.sum(), rtol=1e-4)


def test_seg2_matches_seg_skewed():
    from combblas_tpu.ops.spgemm_seg import spgemm_streamed_seg2

    rng = np.random.default_rng(7)
    m = k = n = 200
    ad = np.zeros((m, k), np.float32)
    for i in range(m):
        deg = min(int(rng.pareto(0.7) + 1), k)
        cols = rng.choice(k, size=deg, replace=False)
        ad[i, cols] = rng.random(deg).astype(np.float32) + 0.1
    bd = (rng.random((k, n)) < 0.2).astype(np.float32) * 0.5
    a = SpCOO.from_dense(ad)
    b = SpCOO.from_dense(bd)
    nnz_s, cks_s, tr_s = spgemm_streamed_seg(a, b, PLUS_TIMES, num_slabs=4,
                                             interpret=True)
    nnz_2, cks_2, tr_2 = spgemm_streamed_seg2(
        a, b, PLUS_TIMES, flops_cap=1 << 13, pad_cap=1 << 16,
        interpret=True)
    assert not bool(tr_s) and not bool(tr_2)
    assert nnz_2 == nnz_s
    np.testing.assert_allclose(float(cks_2), float(cks_s), rtol=1e-5)


@pytest.mark.parametrize("max_widths", [1, 3, 8])
def test_seg2_max_widths_ladders_agree(max_widths):
    """The width-ladder size is a padding/compile tradeoff, never a
    correctness knob: digests must match across ladder choices."""
    from combblas_tpu.ops.spgemm_seg import spgemm_streamed_seg2

    rng = np.random.default_rng(11)
    m = k = n = 120
    ad = np.zeros((m, k), np.float32)
    for i in range(m):
        deg = min(int(rng.pareto(0.7) + 1), k)
        cols = rng.choice(k, size=deg, replace=False)
        ad[i, cols] = rng.random(deg).astype(np.float32) + 0.1
    bd = (rng.random((k, n)) < 0.2).astype(np.float32) * 0.5
    a = SpCOO.from_dense(ad)
    b = SpCOO.from_dense(bd)
    nnz, cks, trunc = spgemm_streamed_seg2(
        a, b, PLUS_TIMES, flops_cap=1 << 12, pad_cap=1 << 16,
        max_widths=max_widths, interpret=True)
    ref = ad.astype(np.float64) @ bd.astype(np.float64)
    assert not bool(trunc)
    assert nnz == int((ref != 0).sum())
    np.testing.assert_allclose(float(cks), ref.sum(), rtol=1e-4)


def test_seg2_flat_slab_flops_clamped():
    """Flat (wide-key) slabs are cut at <= 2^27 products regardless of
    flops_cap: the wide digest step's HLO temps are ~71 B/stream element,
    so an unclamped 2^28 stream compiles to a 19 GB program (HBM OOM on a
    16 GB chip; measured at scale 24)."""
    from combblas_tpu.ops.spgemm_seg import seg2_plan

    rng = np.random.default_rng(5)
    m = k = n = 400
    ad = (rng.random((m, k)) < 0.15).astype(np.float32)
    bd = (rng.random((k, n)) < 0.15).astype(np.float32)
    a = SpCOO.from_dense(ad)
    b = SpCOO.from_dense(bd)
    # a giant budget (largest the sort-limit guard allows) would put every
    # row in one flat slab without the clamp
    a2, cfg = seg2_plan(a, b, flops_cap=1 << 30, pad_cap=1 << 30,
                        flat_max_fl=1 << 20)
    assert all(sl["flat"] for sl in cfg["slabs"])
    for sl in cfg["slabs"]:
        assert sl["flops"] <= (1 << 27)
        assert sl["flat_stream_cap"] <= (1 << 27) + 32768 + 18 * 128


def test_seg2_plan_invariants():
    """Slab bounds cover all live rows; counts/padding consistent; every
    slab's width strictly exceeds its heaviest row's product count."""
    from combblas_tpu.ops.spgemm_seg import seg2_plan

    rng = np.random.default_rng(3)
    m = k = n = 300
    ad = (rng.random((m, k)) < 0.05).astype(np.float32)
    ad[5] = (rng.random(k) < 0.8)  # hub row
    bd = (rng.random((k, n)) < 0.1).astype(np.float32)
    a = SpCOO.from_dense(ad)
    b = SpCOO.from_dense(bd)
    a2, cfg = seg2_plan(a, b, flops_cap=1 << 12, pad_cap=1 << 15)
    bounds = cfg["bounds"]
    assert bounds[0] == 0
    rowfl_ref = (ad @ (bd != 0).astype(np.int64)).sum(axis=1)
    assert bounds[-1] == int((rowfl_ref > 0).sum())
    fl_sorted = np.sort(rowfl_ref[rowfl_ref > 0])[::-1]
    for i, sl in enumerate(cfg["slabs"]):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        assert sl["cnt"] == hi - lo
        assert sl["s_pad"] >= sl["cnt"]
        # class buffers are whole compress tiles; flat slabs have no
        # window buffer (they sort the raw stream, tiled by
        # flat_stream_cap which is itself 32768-granular)
        assert sl["flat"] or (sl["s_pad"] * sl["w"]) % 32768 == 0
        if sl["flat"]:
            # flat slabs take every row below the flat threshold; no
            # window/sentinel invariant (they sort the raw stream)
            assert fl_sorted[lo] < 1 << 9
        else:
            assert sl["w"] > fl_sorted[lo]  # strict: >= 1 trailing sentinel
        assert sl["flops"] == int(fl_sorted[lo:hi].sum())
