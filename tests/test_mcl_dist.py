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
