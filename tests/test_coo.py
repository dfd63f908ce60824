"""SpCOO format invariants and conversions vs dense numpy reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from combblas_tpu import SpCOO, sort_coo, merge, PLUS_TIMES, MIN_PLUS


def rand_sparse(m, n, density=0.3, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    dense = rng.random((m, n)).astype(dtype)
    dense[rng.random((m, n)) > density] = 0.0
    return dense


def test_roundtrip_dense():
    d = rand_sparse(13, 9, seed=1)
    a = SpCOO.from_dense(d)
    np.testing.assert_allclose(np.asarray(a.to_dense()), d, rtol=1e-6)
    assert int(a.nnz) == np.count_nonzero(d)


def test_from_arrays_duplicates():
    # duplicate entries must be summed (SpTuples dedup semantics)
    row = [0, 0, 1, 0]
    col = [1, 1, 2, 0]
    val = [1.0, 2.0, 5.0, 4.0]
    a = SpCOO.from_arrays(row, col, val, (3, 3))
    d = np.zeros((3, 3), np.float32)
    d[0, 1] = 3.0
    d[1, 2] = 5.0
    d[0, 0] = 4.0
    np.testing.assert_allclose(np.asarray(a.to_dense()), d)
    assert int(a.nnz) == 3


def test_sorted_invariant():
    d = rand_sparse(11, 17, seed=2)
    a = SpCOO.from_dense(d)
    r, c = np.asarray(a.row)[: int(a.nnz)], np.asarray(a.col)[: int(a.nnz)]
    keys = r.astype(np.int64) * 17 + c
    assert np.all(np.diff(keys) > 0)


def test_row_ptr():
    d = rand_sparse(10, 6, seed=3)
    a = SpCOO.from_dense(d)
    rp = np.asarray(a.row_ptr())
    counts = (d != 0).sum(axis=1)
    np.testing.assert_array_equal(np.diff(rp), counts)
    assert rp[0] == 0 and rp[-1] == int(a.nnz)


def test_transpose():
    d = rand_sparse(7, 12, seed=4)
    a = SpCOO.from_dense(d)
    at = a.transpose()
    np.testing.assert_allclose(np.asarray(at.to_dense()), d.T, rtol=1e-6)
    # sorted invariant preserved
    r = np.asarray(at.row)[: int(at.nnz)]
    c = np.asarray(at.col)[: int(at.nnz)]
    keys = r.astype(np.int64) * 7 + c
    assert np.all(np.diff(keys) > 0)


def test_with_capacity_grow_shrink():
    d = rand_sparse(5, 5, seed=5)
    a = SpCOO.from_dense(d)
    big = a.with_capacity(a.capacity * 4)
    np.testing.assert_allclose(np.asarray(big.to_dense()), d, rtol=1e-6)
    assert big.capacity == a.capacity * 4


def test_merge_sum():
    d1 = rand_sparse(9, 9, seed=6)
    d2 = rand_sparse(9, 9, seed=7)
    c = merge(SpCOO.from_dense(d1), SpCOO.from_dense(d2))
    np.testing.assert_allclose(np.asarray(c.to_dense()), d1 + d2, rtol=1e-5)


def test_merge_min_semiring():
    d1 = rand_sparse(6, 6, seed=8)
    d2 = rand_sparse(6, 6, seed=9)
    c = merge(SpCOO.from_dense(d1), SpCOO.from_dense(d2), sr=MIN_PLUS)
    # min over present entries; where only one present, that value
    expect = np.where(
        (d1 != 0) & (d2 != 0),
        np.minimum(d1, d2),
        d1 + d2,
    )
    np.testing.assert_allclose(np.asarray(c.to_dense()), expect, rtol=1e-6)


def test_empty():
    a = SpCOO.empty((4, 4))
    assert int(a.nnz) == 0
    np.testing.assert_array_equal(np.asarray(a.to_dense()), np.zeros((4, 4)))
    b = merge(a, SpCOO.from_dense(np.eye(4, dtype=np.float32)))
    np.testing.assert_allclose(np.asarray(b.to_dense()), np.eye(4))


def test_row_split_concat():
    from combblas_tpu.ops.coo import row_concat, row_split

    d = rand_sparse(13, 9, 0.4, seed=130)
    a = SpCOO.from_dense(d)
    parts = row_split(a, 3)
    assert sum(int(p.nnz) for p in parts) == int(a.nnz)
    # pieces reproduce their bands
    off = 0
    for p in parts:
        band = p.shape[0]
        np.testing.assert_allclose(
            np.asarray(p.to_dense()), d[off : off + band], rtol=1e-6
        )
        off += band
    back = row_concat(parts)
    np.testing.assert_allclose(np.asarray(back.to_dense()), d, rtol=1e-6)


def test_load_imbalance():
    import jax

    from combblas_tpu.parallel.dist import DistSpMat
    from combblas_tpu.parallel.grid import ProcGrid

    g = ProcGrid.make(2, 2, devices=jax.devices()[:4])
    d = rand_sparse(16, 16, 0.5, seed=131)
    A = DistSpMat.from_local(SpCOO.from_dense(d), g)
    li = float(A.load_imbalance())
    assert li >= 1.0


def test_find_sparse_roundtrip():
    from combblas_tpu.ops.coo import find

    d = rand_sparse(9, 11, 0.4, seed=141)
    a = SpCOO.from_dense(d)
    i, j, v = find(a)
    b = SpCOO.from_arrays(i, j, v, a.shape)
    np.testing.assert_allclose(np.asarray(b.to_dense()), d, rtol=1e-6)
