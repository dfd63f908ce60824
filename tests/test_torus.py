"""The fork's signature known-answer test (``Applications/SpMMError.cpp:30``):
a 4x4 torus built from explicit (i, j, v) vectors; every pairwise product
G1·G2 must have exactly 112 nonzeros, identically across construction paths
and execution variants."""

import numpy as np
import jax
import pytest

from combblas_tpu import SpCOO
from combblas_tpu.ops.spgemm import spgemm_auto
from combblas_tpu.parallel.grid import ProcGrid
from combblas_tpu.parallel.dist import DistSpMat
from combblas_tpu.parallel.summa import summa_bounds, summa_spgemm

# the same vectors as SpMMError.cpp:32-33
TORUS_I = [0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15]*4
TORUS_J = [3,0,1,2,7,4,5,6,11,8,9,10,15,12,13,14,
           1,2,3,0,5,6,7,4,9,10,11,8,13,14,15,12,
           12,13,14,15,0,1,2,3,4,5,6,7,8,9,10,11,
           4,5,6,7,8,9,10,11,12,13,14,15,0,1,2,3]


def torus_matrix():
    return SpCOO.from_arrays(
        TORUS_I, TORUS_J, np.ones(64, np.float32), (16, 16)
    )


def test_torus_construction():
    g = torus_matrix()
    assert int(g.nnz) == 64  # 4-regular on 16 vertices


def test_torus_square_nnz_112_local():
    g1 = torus_matrix()
    g2 = torus_matrix()
    g12 = spgemm_auto(g1, g2)
    assert int(g12.nnz) == 112
    # value check: A² of the 0/1 torus counts 2-paths
    d = np.asarray(g1.to_dense())
    np.testing.assert_allclose(np.asarray(g12.to_dense()), d @ d, rtol=1e-6)


def test_torus_square_nnz_112_distributed():
    g = ProcGrid.make(2, 2, devices=jax.devices()[:4])
    G1 = DistSpMat.from_local(torus_matrix(), g)
    G2 = DistSpMat.from_local(torus_matrix(), g)
    fc, oc = summa_bounds(G1, G2)
    G12 = summa_spgemm(G1, G2, flops_cap=fc, out_capacity=oc)
    assert int(G12.total_nnz()) == 112
    d = np.asarray(torus_matrix().to_dense())
    np.testing.assert_allclose(G12.to_dense(), d @ d, rtol=1e-6)
