"""3D split-layer SpGEMM vs the 2D result — the reference's SpGEMM3DTest
pattern (layers {1,2} compared against the 2D golden product,
``SpGEMM3DTest.cpp:75-93``)."""

import numpy as np
import jax
import pytest

from combblas_tpu import SpCOO
from combblas_tpu.parallel.grid import ProcGrid
from combblas_tpu.parallel.summa3d import (
    Dist3DSpMat,
    summa3d_bounds,
    summa3d_spgemm,
)
from tests.test_coo import rand_sparse


def grid3d(layers=2):
    return ProcGrid.make(2, 2, layers=layers, devices=jax.devices()[: 4 * layers])


def test_3d_roundtrip():
    d = rand_sparse(17, 13, 0.3, seed=80)
    g = grid3d()
    for split in ("col", "row"):
        a = Dist3DSpMat.from_dist2d(SpCOO.from_dense(d), g, split)
        np.testing.assert_allclose(
            np.asarray(a.to_local().to_dense()), d, rtol=1e-6
        )


def test_summa3d_vs_dense():
    da = rand_sparse(16, 16, 0.35, seed=81)
    db = rand_sparse(16, 16, 0.35, seed=82)
    g = grid3d(2)
    A = Dist3DSpMat.from_dist2d(SpCOO.from_dense(da), g, "col")
    B = Dist3DSpMat.from_dist2d(SpCOO.from_dense(db), g, "row")
    fc, oc = summa3d_bounds(A, B)
    C = summa3d_spgemm(A, B, flops_cap=fc, out_capacity=oc)
    np.testing.assert_allclose(
        np.asarray(C.to_local().to_dense()), da @ db, rtol=1e-5, atol=1e-6
    )


def test_summa3d_square():
    da = rand_sparse(24, 24, 0.2, seed=83)
    g = grid3d(2)
    A = Dist3DSpMat.from_dist2d(SpCOO.from_dense(da), g, "col")
    B = Dist3DSpMat.from_dist2d(SpCOO.from_dense(da), g, "row")
    fc, oc = summa3d_bounds(A, B)
    C = summa3d_spgemm(A, B, flops_cap=fc, out_capacity=oc)
    np.testing.assert_allclose(
        np.asarray(C.to_local().to_dense()), da @ da, rtol=1e-5, atol=1e-6
    )


def test_mem_efficient_3d_phases():
    from combblas_tpu.parallel.summa3d import mem_efficient_spgemm3d

    da = rand_sparse(16, 16, 0.35, seed=84)
    db = rand_sparse(16, 16, 0.35, seed=85)
    g = grid3d(2)
    A = Dist3DSpMat.from_dist2d(SpCOO.from_dense(da), g, "col")
    B = Dist3DSpMat.from_dist2d(SpCOO.from_dense(db), g, "row")
    for phases in (1, 2):
        C = mem_efficient_spgemm3d(A, B, phases=phases)
        np.testing.assert_allclose(
            np.asarray(C.to_local().to_dense()), da @ db, rtol=1e-4, atol=1e-6
        )
