"""LACC vs FastSV cross-validation — the reference ships both CC algorithms
(``Applications/CC.h`` and ``Applications/FastSV.h``); their partitions must
agree."""

import numpy as np
import pytest

from combblas_tpu import SpCOO
from combblas_tpu.models.cc import fastsv_local
from combblas_tpu.models.lacc import lacc_local
from tests.test_apps import ring_graph, two_components


def same_partition(l1, l2):
    n = len(l1)
    remap = {}
    for a, b in zip(l1, l2):
        if a in remap and remap[a] != b:
            return False
        remap[a] = b
    return len(set(l1)) == len(set(l2))


def test_lacc_matches_fastsv_random():
    rng = np.random.default_rng(8)
    for _ in range(4):
        n = 26
        d = (rng.random((n, n)) < 0.07).astype(np.float32)
        d = np.maximum(d, d.T)
        np.fill_diagonal(d, 0)
        a = SpCOO.from_dense(d)
        assert same_partition(
            np.asarray(lacc_local(a)).tolist(),
            np.asarray(fastsv_local(a)).tolist(),
        )


def test_lacc_known_graphs():
    l = np.asarray(lacc_local(SpCOO.from_dense(ring_graph(15))))
    assert len(np.unique(l)) == 1
    l2 = np.asarray(lacc_local(SpCOO.from_dense(two_components(16))))
    assert len(np.unique(l2)) == 2


def test_lacc_dist_matches_local():
    import jax

    from combblas_tpu.models.lacc import lacc_dist
    from combblas_tpu.parallel.dist import DistSpMat
    from combblas_tpu.parallel.grid import ProcGrid

    d = two_components(16)
    g = ProcGrid.make(2, 2, devices=jax.devices()[:4])
    A = DistSpMat.from_local(SpCOO.from_dense(d), g)
    labels = np.asarray(lacc_dist(A))[:16]
    ref = np.asarray(lacc_local(SpCOO.from_dense(d)))
    assert same_partition(labels.tolist(), ref.tolist())
