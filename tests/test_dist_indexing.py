"""Distributed SpRef/SpAsgn/permute (parallel/indexing.py) on the 8-device
mesh, checked against the local ops/indexing.py twins and dense numpy.

Counterparts: SubsRef_SR (SpParMat.cpp:2028), SpAsgn (:2427),
RandPermute/RenameVertices (MCL.cpp:497, DistEdgeList.cpp:364), plus the
summa_spgemm_auto saturation-retry wrapper.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from combblas_tpu.ops.coo import SpCOO
from combblas_tpu.parallel.dist import DistSpMat
from combblas_tpu.parallel.grid import ProcGrid
from combblas_tpu.parallel.indexing import (
    dist_permute,
    dist_prune_block,
    dist_spasgn,
    dist_spref,
)
from combblas_tpu.parallel.summa import summa_spgemm_auto


@pytest.fixture(scope="module")
def grid():
    # square 2x2 sub-grid (SpGEMM requires square, as the reference)
    return ProcGrid.make(pr=2, pc=2, devices=jax.devices()[:4])


def _rand_sp(rng, m, n, density=0.1):
    mask = rng.random((m, n)) < density
    d = np.where(mask, rng.integers(1, 9, (m, n)), 0).astype(np.float32)
    return d


def test_dist_spref_vs_dense(grid):
    rng = np.random.default_rng(0)
    d = _rand_sp(rng, 24, 30)
    a = DistSpMat.from_coo_arrays(*np.nonzero(d), d[np.nonzero(d)], (24, 30), grid)
    ri = np.array([3, 11, 0, 23, 11])  # repeats allowed
    ci = np.array([29, 4, 4, 17])
    c = dist_spref(a, ri, ci)
    np.testing.assert_allclose(c.to_dense(), d[np.ix_(ri, ci)])


def test_dist_prune_block(grid):
    rng = np.random.default_rng(1)
    d = _rand_sp(rng, 16, 16, 0.3)
    a = DistSpMat.from_coo_arrays(*np.nonzero(d), d[np.nonzero(d)], (16, 16), grid)
    ri, ci = np.array([1, 5, 9]), np.array([2, 3, 15])
    out = dist_prune_block(a, ri, ci)
    ref = d.copy()
    ref[np.ix_(ri, ci)] = 0
    np.testing.assert_allclose(out.to_dense(), ref)


def test_dist_spasgn_vs_dense(grid):
    rng = np.random.default_rng(2)
    d = _rand_sp(rng, 20, 20, 0.2)
    a = DistSpMat.from_coo_arrays(*np.nonzero(d), d[np.nonzero(d)], (20, 20), grid)
    ri = np.array([0, 7, 13])
    ci = np.array([5, 6])
    bd = _rand_sp(rng, 3, 2, 0.9)
    b = DistSpMat.from_coo_arrays(*np.nonzero(bd), bd[np.nonzero(bd)], (3, 2), grid)
    out = dist_spasgn(a, ri, ci, b)
    ref = d.copy()
    ref[np.ix_(ri, ci)] = bd
    np.testing.assert_allclose(out.to_dense(), ref)


def test_dist_permute_symmetric(grid):
    rng = np.random.default_rng(3)
    n = 32
    d = _rand_sp(rng, n, n, 0.15)
    a = DistSpMat.from_coo_arrays(*np.nonzero(d), d[np.nonzero(d)], (n, n), grid)
    perm = rng.permutation(n).astype(np.int32)
    out = dist_permute(a, perm)
    ref = np.zeros_like(d)
    ref[np.ix_(perm, perm)] = d
    np.testing.assert_allclose(out.to_dense(), ref)
    # agreement with the selector-SpGEMM route: A(pinv, pinv) == permuted
    pinv = np.argsort(perm)
    via_spref = dist_spref(a, pinv, pinv)
    np.testing.assert_allclose(via_spref.to_dense(), ref)


def test_dist_permute_rectangular_and_drops(grid):
    rng = np.random.default_rng(4)
    d = _rand_sp(rng, 12, 18, 0.3)
    a = DistSpMat.from_coo_arrays(*np.nonzero(d), d[np.nonzero(d)], (12, 18), grid)
    rmap = rng.permutation(12).astype(np.int32)
    cmap = np.full(18, 1 << 20, np.int32)  # drop some columns out of range
    keep_cols = np.arange(0, 18, 2)
    cmap[keep_cols] = np.arange(len(keep_cols))
    out = dist_permute(a, rmap, cmap)
    ref = np.zeros_like(d)
    ref[np.ix_(rmap, cmap[keep_cols])] = d[:, keep_cols]
    np.testing.assert_allclose(out.to_dense(), ref)


def test_summa_auto_saturation_retry(grid):
    # deliberately dense product so the initial (estimate-sized) buffer is
    # too small: the wrapper must retry, not silently truncate.
    n = 16
    d = (np.ones((n, n)) - np.eye(n)).astype(np.float32)
    a = DistSpMat.from_coo_arrays(*np.nonzero(d), d[np.nonzero(d)], (n, n), grid)
    c = summa_spgemm_auto(a, a, nnz_estimate=4)  # absurdly small estimate
    np.testing.assert_allclose(c.to_dense(), d @ d)


def test_dist_randperm_permute_roundtrip(grid):
    # the MCL RandPermute pipeline: dist_rand_perm + dist_permute, then
    # the inverse permutation restores the original matrix.
    from combblas_tpu.parallel.vector import dist_rand_perm, dist_invert

    rng = np.random.default_rng(5)
    n = 24
    d = _rand_sp(rng, n, n, 0.2)
    a = DistSpMat.from_coo_arrays(*np.nonzero(d), d[np.nonzero(d)], (n, n), grid)
    perm = dist_rand_perm(jax.random.PRNGKey(0), n, grid)
    ph = np.asarray(perm)[:n]
    b = dist_permute(a, ph)
    ref = np.zeros_like(d)
    ref[np.ix_(ph, ph)] = d
    np.testing.assert_allclose(b.to_dense(), ref)
    inv = np.argsort(ph)
    back = dist_permute(b, inv)
    np.testing.assert_allclose(back.to_dense(), d)
