"""Elementwise ops, reductions, k-select vs dense references."""

import numpy as np
import jax.numpy as jnp
import pytest

from combblas_tpu import SpCOO, PLUS_TIMES, MIN_PLUS
from combblas_tpu.ops.ewise import (
    add,
    apply_values,
    dim_apply,
    ewise_mult,
    prune,
    prune_column,
    set_difference,
)
from combblas_tpu.ops.reduce import nnz_per, reduce_dim
from combblas_tpu.ops.kselect import kselect_col, select_top_k_per_col
from tests.test_coo import rand_sparse


def test_apply():
    d = rand_sparse(7, 7, 0.5, seed=30)
    a = apply_values(SpCOO.from_dense(d), lambda v: v * 2.0)
    np.testing.assert_allclose(np.asarray(a.to_dense()), d * 2.0, rtol=1e-6)


def test_prune():
    d = rand_sparse(9, 9, 0.6, seed=31)
    a = prune(SpCOO.from_dense(d), lambda v: v < 0.5)
    expect = np.where(d >= 0.5, d, 0.0)
    np.testing.assert_allclose(np.asarray(a.to_dense()), expect, rtol=1e-6)
    assert int(a.nnz) == np.count_nonzero(expect)


def test_dim_apply():
    d = rand_sparse(6, 8, 0.5, seed=32)
    x = np.arange(1.0, 9.0, dtype=np.float32)
    a = dim_apply(SpCOO.from_dense(d), jnp.asarray(x), "col")
    np.testing.assert_allclose(np.asarray(a.to_dense()), d * x[None, :], rtol=1e-6)
    xr = np.arange(1.0, 7.0, dtype=np.float32)
    ar = dim_apply(SpCOO.from_dense(d), jnp.asarray(xr), "row")
    np.testing.assert_allclose(np.asarray(ar.to_dense()), d * xr[:, None], rtol=1e-6)


def test_ewise_mult_and_exclude():
    d1 = rand_sparse(10, 10, 0.4, seed=33)
    d2 = rand_sparse(10, 10, 0.4, seed=34)
    a, b = SpCOO.from_dense(d1), SpCOO.from_dense(d2)
    c = ewise_mult(a, b)
    np.testing.assert_allclose(np.asarray(c.to_dense()), d1 * d2, rtol=1e-5)
    e = set_difference(a, b)
    expect = np.where(d2 == 0, d1, 0.0)
    np.testing.assert_allclose(np.asarray(e.to_dense()), expect, rtol=1e-6)


def test_add_union():
    d1 = rand_sparse(8, 8, 0.4, seed=35)
    d2 = rand_sparse(8, 8, 0.4, seed=36)
    c = add(SpCOO.from_dense(d1), SpCOO.from_dense(d2))
    np.testing.assert_allclose(np.asarray(c.to_dense()), d1 + d2, rtol=1e-5)


def test_reduce():
    d = rand_sparse(9, 5, 0.5, seed=37)
    a = SpCOO.from_dense(d)
    np.testing.assert_allclose(
        np.asarray(reduce_dim(a, "row")), d.sum(axis=1), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(reduce_dim(a, "col")), d.sum(axis=0), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(nnz_per(a, "col")), (d != 0).sum(axis=0)
    )


def test_kselect():
    d = rand_sparse(20, 6, 0.7, seed=38)
    a = SpCOO.from_dense(d)
    k = 3
    th = np.asarray(kselect_col(a, k))
    for j in range(6):
        colvals = np.sort(d[:, j][d[:, j] != 0])[::-1]
        if len(colvals) >= k:
            np.testing.assert_allclose(th[j], colvals[k - 1], rtol=1e-6)
        else:
            assert th[j] == -np.inf


def test_select_top_k():
    d = rand_sparse(20, 6, 0.7, seed=39)
    a = SpCOO.from_dense(d)
    k = 2
    sel = select_top_k_per_col(a, k)
    dd = np.asarray(sel.to_dense())
    for j in range(6):
        colvals = np.sort(d[:, j][d[:, j] != 0])[::-1]
        kept = np.sort(dd[:, j][dd[:, j] != 0])[::-1]
        np.testing.assert_allclose(kept, colvals[:k], rtol=1e-6)


def test_prune_column():
    d = rand_sparse(10, 4, 0.6, seed=40)
    a = SpCOO.from_dense(d)
    th = np.asarray([0.3, 0.5, 0.2, 0.9], np.float32)
    pruned = prune_column(a, jnp.asarray(th), lambda v, t: v < t)
    expect = np.where(d >= th[None, :], d, 0.0)
    np.testing.assert_allclose(np.asarray(pruned.to_dense()), expect, rtol=1e-6)


def test_loops_and_induced():
    from combblas_tpu.ops.indexing import add_loops, induced_subgraph, remove_loops

    d = rand_sparse(8, 8, 0.4, seed=140)
    np.fill_diagonal(d, 0)
    d[2, 2] = 0.7
    a = SpCOO.from_dense(d)
    nl = remove_loops(a)
    expect = d.copy()
    np.fill_diagonal(expect, 0)
    np.testing.assert_allclose(np.asarray(nl.to_dense()), expect, rtol=1e-6)
    wl = add_loops(a, 2.0)
    expect = d.copy()
    for i in range(8):
        if expect[i, i] == 0:
            expect[i, i] = 2.0
    np.testing.assert_allclose(np.asarray(wl.to_dense()), expect, rtol=1e-6)
    verts = [1, 3, 5]
    sub = induced_subgraph(a, verts)
    np.testing.assert_allclose(
        np.asarray(sub.to_dense()), d[np.ix_(verts, verts)], rtol=1e-6
    )


def test_prune_ktips():
    from combblas_tpu.ops.indexing import prune_ktips

    # path 0-1-2-3 attached to a triangle 3-4-5: tips 0,1,2 get pruned
    d = np.zeros((6, 6), np.float32)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 3)]
    for i, j in edges:
        d[i, j] = d[j, i] = 1.0
    pruned = prune_ktips(SpCOO.from_dense(d), k=2)
    dd = np.asarray(pruned.to_dense())
    # triangle survives, path edges gone
    assert dd[3, 4] and dd[4, 5] and dd[5, 3]
    assert not dd[0, 1] and not dd[1, 2] and not dd[2, 3]
