"""Distributed parallel write/read (io/parallel.py) — ParallelWriteMM /
ParallelBinaryWrite / ParallelReadMM counterparts (SpParMat.cpp:4120,620,
3980), single-process degenerate case on the 8-device mesh."""

import numpy as np

from combblas_tpu import SpCOO
from combblas_tpu.io.binary import read_binary
from combblas_tpu.io.mtx import read_mtx
from combblas_tpu.io.parallel import (
    parallel_read_mtx,
    parallel_write_binary,
    parallel_write_mtx,
)
from combblas_tpu.parallel.dist import DistSpMat
from combblas_tpu.parallel.grid import ProcGrid
from tests.test_coo import rand_sparse


def _dist(seed=90, m=22, n=18):
    d = rand_sparse(m, n, 0.3, seed=seed)
    g = ProcGrid.make()
    return d, DistSpMat.from_local(SpCOO.from_dense(d), g), g


def test_parallel_write_mtx_roundtrip(tmp_path):
    d, A, g = _dist()
    p = str(tmp_path / "a.mtx")
    parallel_write_mtx(p, A, comment="parallel write test")
    back = read_mtx(p)
    np.testing.assert_allclose(np.asarray(back.to_dense()), d, rtol=1e-6)


def test_parallel_write_mtx_matches_header(tmp_path):
    d, A, g = _dist(seed=91)
    p = str(tmp_path / "b.mtx")
    parallel_write_mtx(p, A)
    lines = open(p).read().splitlines()
    assert lines[0].startswith("%%MatrixMarket")
    m, n, nnz = (int(x) for x in lines[1].split())
    assert (m, n) == A.gshape
    assert nnz == int(np.asarray(A.nnz).sum())
    assert len(lines) == 2 + nnz  # offsets left no holes


def test_parallel_write_binary_roundtrip(tmp_path):
    d, A, g = _dist(seed=92)
    p = str(tmp_path / "a.cbin")
    parallel_write_binary(p, A)
    back = read_binary(p)
    np.testing.assert_allclose(np.asarray(back.to_dense()), d, rtol=1e-6)


def test_parallel_read_mtx(tmp_path):
    d, A, g = _dist(seed=93)
    p = str(tmp_path / "c.mtx")
    parallel_write_mtx(p, A)
    B = parallel_read_mtx(p, g)
    np.testing.assert_allclose(B.to_dense(), d, rtol=1e-6)
