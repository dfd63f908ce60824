"""Distributed elementwise / reduce / transpose / kselect vs local reference."""

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
    row_vec_len,
)
from combblas_tpu.parallel.elementwise import (
    dist_add,
    dist_apply,
    dist_dim_apply,
    dist_ewise_mult,
    dist_kselect_col,
    dist_nnz_per_col,
    dist_prune,
    dist_prune_column,
    dist_reduce,
    dist_transpose,
)
from combblas_tpu.semiring import MAX_FIRST
from tests.test_coo import rand_sparse


def grid22():
    return ProcGrid.make(2, 2, devices=jax.devices()[:4])


def _double(v):
    return v * 2.0


def _small(v):
    return v < 0.5


def test_dist_apply_prune():
    d = rand_sparse(14, 18, 0.4, seed=70)
    A = DistSpMat.from_local(SpCOO.from_dense(d), grid22())
    np.testing.assert_allclose(dist_apply(A, _double).to_dense(), d * 2, rtol=1e-6)
    pruned = dist_prune(A, _small)
    np.testing.assert_allclose(
        pruned.to_dense(), np.where(d >= 0.5, d, 0.0), rtol=1e-6
    )


def test_dist_ewise():
    d1 = rand_sparse(12, 12, 0.4, seed=71)
    d2 = rand_sparse(12, 12, 0.4, seed=72)
    g = grid22()
    A = DistSpMat.from_local(SpCOO.from_dense(d1), g)
    B = DistSpMat.from_local(SpCOO.from_dense(d2), g)
    np.testing.assert_allclose(dist_ewise_mult(A, B).to_dense(), d1 * d2, rtol=1e-5)
    np.testing.assert_allclose(
        dist_ewise_mult(A, B, exclude=True).to_dense(),
        np.where(d2 == 0, d1, 0.0),
        rtol=1e-6,
    )
    np.testing.assert_allclose(dist_add(A, B).to_dense(), d1 + d2, rtol=1e-5)


def test_dist_reduce_and_dim_apply():
    d = rand_sparse(16, 12, 0.5, seed=73)
    g = grid22()
    A = DistSpMat.from_local(SpCOO.from_dense(d), g)
    rsum = np.asarray(dist_reduce(A, "row"))
    np.testing.assert_allclose(rsum[:16], d.sum(axis=1), rtol=1e-5)
    csum = np.asarray(dist_reduce(A, "col"))
    np.testing.assert_allclose(csum[:12], d.sum(axis=0), rtol=1e-5)
    cmax = np.asarray(dist_reduce(A, "col", MAX_FIRST))
    np.testing.assert_allclose(
        cmax[:12], np.where((d != 0).any(0), np.max(d, axis=0), -np.inf), rtol=1e-5
    )
    # column scaling with the reduced vector (the MCL normalize pattern)
    inv = jnp.where(jnp.asarray(csum) > 0, 1.0 / jnp.asarray(csum), 0.0)
    S = dist_dim_apply(A, inv, "col")
    expect = d / np.where(d.sum(0) > 0, d.sum(0), 1.0)[None, :]
    np.testing.assert_allclose(S.to_dense(), expect, rtol=1e-5)


def test_dist_nnz_and_prune_column():
    d = rand_sparse(10, 8, 0.5, seed=74)
    g = grid22()
    A = DistSpMat.from_local(SpCOO.from_dense(d), g)
    counts = np.asarray(dist_nnz_per_col(A))
    np.testing.assert_array_equal(counts[:8], (d != 0).sum(axis=0))
    th = np.linspace(0.2, 0.8, col_vec_len(d.shape, g)).astype(np.float32)

    def below(v, t):
        return v < t

    P = dist_prune_column(A, jnp.asarray(th), below)
    expect = np.where(d >= th[None, :8], d, 0.0)
    np.testing.assert_allclose(P.to_dense(), expect, rtol=1e-6)


def test_dist_kselect():
    d = rand_sparse(24, 10, 0.7, seed=75)
    g = grid22()
    A = DistSpMat.from_local(SpCOO.from_dense(d), g)
    th = np.asarray(dist_kselect_col(A, 3))
    from combblas_tpu.ops.kselect import kselect_col

    ref = np.asarray(kselect_col(SpCOO.from_dense(d), 3))
    np.testing.assert_allclose(th[:10], ref, rtol=1e-6)


def test_dist_transpose():
    d = rand_sparse(14, 14, 0.3, seed=76)
    g = grid22()
    A = DistSpMat.from_local(SpCOO.from_dense(d), g)
    T = dist_transpose(A)
    np.testing.assert_allclose(T.to_dense(), d.T, rtol=1e-6)
    # involution
    TT = dist_transpose(T)
    np.testing.assert_allclose(TT.to_dense(), d, rtol=1e-6)


def test_dist_kselect_varying_k_and_kcap():
    """Per-column varying k, with and without the <=k-candidate shipping
    (k_cap — the reference's Kselect1 protocol, SpParMat.cpp:1191)."""
    from combblas_tpu.ops.kselect import kselect_col

    d = rand_sparse(24, 12, 0.8, seed=77)
    g = grid22()
    A = DistSpMat.from_local(SpCOO.from_dense(d), g)
    rng = np.random.default_rng(5)
    kv = rng.integers(1, 6, 12).astype(np.int32)
    ncols_pad = A.grid.pc * (
        np.asarray(dist_kselect_col(A, 1)).shape[0] // A.grid.pc)
    kfull = np.zeros((ncols_pad,), np.int32)
    kfull[:12] = kv
    ref = np.asarray(kselect_col(SpCOO.from_dense(d), jnp.asarray(kv)))
    th_nocap = np.asarray(
        dist_kselect_col(A, jnp.asarray(kfull), full_gather=True))
    np.testing.assert_allclose(th_nocap[:12], ref, rtol=1e-6)
    th_cap = np.asarray(dist_kselect_col(A, jnp.asarray(kfull), k_cap=8))
    np.testing.assert_allclose(th_cap[:12], ref, rtol=1e-6)
    # k > k_cap clamps to k_cap (only k_cap candidates are shipped)
    th_clamp = np.asarray(dist_kselect_col(A, 5, k_cap=2))
    ref2 = np.asarray(kselect_col(SpCOO.from_dense(d), 2))
    np.testing.assert_allclose(th_clamp[:12], ref2, rtol=1e-6)
