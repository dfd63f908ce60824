"""Distributed layer on an 8-device virtual CPU mesh (4x2 / 2x2 grids) —
the moral equivalent of the reference's `mpiexec -n 4/16` ctest tier."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from combblas_tpu import SpCOO
from combblas_tpu.parallel.grid import ProcGrid
from combblas_tpu.parallel.dist import (
    DistSpMat,
    block_dims,
    col_vec_len,
    dist_vec,
    row_vec_len,
)
from combblas_tpu.parallel.summa import summa_bounds, summa_spgemm
from combblas_tpu.parallel.spmv import dist_spmv, dist_spmsv_masked
from combblas_tpu.semiring import MAX_SECOND, MIN_PLUS
from tests.test_coo import rand_sparse


def grid22():
    return ProcGrid.make(2, 2, devices=jax.devices()[:4])


def grid42():
    return ProcGrid.make(4, 2, devices=jax.devices()[:8])


def test_roundtrip_distribution():
    d = rand_sparse(19, 23, 0.3, seed=50)
    for g in (grid22(), grid42()):
        a = DistSpMat.from_local(SpCOO.from_dense(d), g)
        np.testing.assert_allclose(a.to_dense(), d, rtol=1e-6)
        assert int(a.total_nnz()) == np.count_nonzero(d)


def test_summa_vs_dense():
    da = rand_sparse(21, 17, 0.3, seed=51)
    db = rand_sparse(17, 15, 0.3, seed=52)
    g = grid22()
    A = DistSpMat.from_local(SpCOO.from_dense(da), g)
    B = DistSpMat.from_local(SpCOO.from_dense(db), g)
    fc, oc = summa_bounds(A, B)
    C = summa_spgemm(A, B, flops_cap=fc, out_capacity=oc)
    np.testing.assert_allclose(C.to_dense(), da @ db, rtol=1e-5, atol=1e-6)


def test_summa_min_plus():
    da = rand_sparse(9, 9, 0.5, seed=53)
    g = grid22()
    A = DistSpMat.from_local(SpCOO.from_dense(da), g)
    fc, oc = summa_bounds(A, A)
    C = summa_spgemm(A, A, MIN_PLUS, flops_cap=fc, out_capacity=oc)
    # local reference
    from combblas_tpu.ops.spgemm import spgemm_auto

    ref = spgemm_auto(SpCOO.from_dense(da), SpCOO.from_dense(da), MIN_PLUS)
    np.testing.assert_allclose(C.to_dense(), np.asarray(ref.to_dense()), rtol=1e-5)


def test_dist_spmv():
    d = rand_sparse(20, 12, 0.4, seed=54)
    rng = np.random.default_rng(55)
    for g in (grid22(), grid42()):
        A = DistSpMat.from_local(SpCOO.from_dense(d), g)
        nx = col_vec_len(d.shape, g)
        x = np.zeros(nx, np.float32)
        x[:12] = rng.random(12).astype(np.float32)
        xd = dist_vec(x, g) if nx == x.shape[0] else jnp.asarray(x)
        y = np.asarray(dist_spmv(A, jnp.asarray(x)))
        np.testing.assert_allclose(y[:20], d @ x[:12], rtol=1e-5, atol=1e-6)
        # padding region stays zero
        np.testing.assert_allclose(y[20:], 0.0, atol=1e-6)


def test_dist_spmsv_masked_transpose():
    """BFS-style frontier push on the mesh vs the local kernel."""
    d = (rand_sparse(16, 16, 0.25, seed=56) != 0).astype(np.float32)
    g = grid22()
    A = DistSpMat.from_local(SpCOO.from_dense(d), g)
    n = 16
    nx = row_vec_len(d.shape, g)
    x_val = np.zeros(nx, np.float32)
    x_mask = np.zeros(nx, bool)
    x_val[:n] = np.arange(1, n + 1)
    x_mask[[3, 7, 11]] = True
    y, ym = dist_spmsv_masked(
        A, jnp.asarray(x_val), jnp.asarray(x_mask), MAX_SECOND, transpose=True
    )
    y, ym = np.asarray(y), np.asarray(ym)
    from combblas_tpu.ops.spmv import spmsv_masked

    yl, yml = spmsv_masked(
        SpCOO.from_dense(d),
        jnp.asarray(x_val[:n]),
        jnp.asarray(x_mask[:n]),
        MAX_SECOND,
        transpose=True,
    )
    np.testing.assert_array_equal(ym[:n], np.asarray(yml))
    np.testing.assert_allclose(y[:n][ym[:n]], np.asarray(yl)[np.asarray(yml)])


def test_block_dims_tiling():
    g = grid42()
    mb, nb = block_dims((19, 23), g)
    assert mb % g.pc == 0 and nb % g.pr == 0
    assert mb * g.pr >= 19 and nb * g.pc >= 23


def test_est_nnz_spgemm_sampling():
    """Cohen sampling estimator (EstPerProcessNnzSpMV, ParFriends.h:2810):
    within ~25% of the true product nnz at 64 rounds."""
    import jax
    from combblas_tpu.parallel.spmv import est_nnz_spgemm_sampling

    rng = np.random.default_rng(11)
    d1 = (rng.random((40, 40)) < 0.12).astype(np.float32)
    d2 = (rng.random((40, 40)) < 0.12).astype(np.float32)
    g = ProcGrid.make(2, 2, devices=jax.devices()[:4])
    A = DistSpMat.from_local(SpCOO.from_dense(d1), g)
    B = DistSpMat.from_local(SpCOO.from_dense(d2), g)
    true_nnz = int((d1 @ d2 != 0).sum())
    est = est_nnz_spgemm_sampling(A, B, jax.random.PRNGKey(0), rounds=64)
    assert 0.75 * true_nnz <= est <= 1.33 * true_nnz, (est, true_nnz)
