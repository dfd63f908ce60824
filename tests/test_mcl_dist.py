"""Distributed MCL vs local MCL on the two-cliques graph."""

import numpy as np
import jax
import pytest

from combblas_tpu import SpCOO
from combblas_tpu.models.mcl import MCLParams, mcl_dist, mcl_local
from combblas_tpu.parallel.grid import ProcGrid
from combblas_tpu.parallel.dist import DistSpMat
from tests.test_apps import two_components


def test_mcl_dist_two_cliques():
    d = two_components(12)
    # self loops added locally, matching mcl_local's AdjustLoops
    dl = d + np.eye(12, dtype=np.float32)
    g = ProcGrid.make(2, 2, devices=jax.devices()[:4])
    A = DistSpMat.from_local(SpCOO.from_dense(dl), g)
    labels, iters = mcl_dist(A, MCLParams(max_iters=30, add_self_loops=False))
    l = np.asarray(labels)[:12]
    assert len(np.unique(l)) == 2
    assert np.all(l[:6] == l[0]) and np.all(l[6:] == l[6])


def test_mcl_dist_phased_matches():
    d = two_components(12) + np.eye(12, dtype=np.float32)
    g = ProcGrid.make(2, 2, devices=jax.devices()[:4])
    A = DistSpMat.from_local(SpCOO.from_dense(d), g)
    l1, _ = mcl_dist(A, MCLParams(max_iters=20, add_self_loops=False), phases=1)
    l2, _ = mcl_dist(A, MCLParams(max_iters=20, add_self_loops=False), phases=2)
    # same clustering structure regardless of phase count
    a1, a2 = np.asarray(l1)[:12], np.asarray(l2)[:12]
    assert (len(np.unique(a1)), len(np.unique(a2))) == (2, 2)


def test_mcl_dist_3d_matches_2d():
    """layers>1 routes the expansion through the 3D path (MCL.cpp:577 ->
    MemEfficientSpGEMM3D) and must produce the same clustering."""
    d = two_components(12) + np.eye(12, dtype=np.float32)
    g2 = ProcGrid.make(2, 2, devices=jax.devices()[:4])
    g3 = ProcGrid.make(2, 2, layers=2, devices=jax.devices()[:8])
    A = DistSpMat.from_local(SpCOO.from_dense(d), g2)
    l2d, _ = mcl_dist(A, MCLParams(max_iters=20, add_self_loops=False))
    l3d, _ = mcl_dist(A, MCLParams(max_iters=20, add_self_loops=False),
                      phases=2, layers=2, grid3=g3)
    a2, a3 = np.asarray(l2d)[:12], np.asarray(l3d)[:12]
    assert len(np.unique(a3)) == 2
    # identical partition (label values may differ)
    for grp in np.unique(a2):
        members = a3[a2 == grp]
        assert len(np.unique(members)) == 1
