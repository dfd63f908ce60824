"""Distributed RCM (models/ordering.py:rcm_order_dist) vs the local RCM and
the bandwidth-reduction property.  Counterpart: Ordering/RCM.cpp:332,361."""

import jax
import numpy as np
import pytest

from combblas_tpu import SpCOO
from combblas_tpu.models.ordering import rcm_order, rcm_order_dist
from combblas_tpu.parallel.dist import DistSpMat
from combblas_tpu.parallel.grid import ProcGrid


def bandwidth(d, order):
    perm = np.empty_like(order)
    perm[order] = np.arange(len(order))
    r, c = np.nonzero(d)
    if r.size == 0:
        return 0
    return int(np.abs(perm[r] - perm[c]).max())


def _sym_banded(n, seed, extra=0.06):
    rng = np.random.default_rng(seed)
    d = np.zeros((n, n), np.float32)
    for i in range(n - 1):
        d[i, i + 1] = d[i + 1, i] = 1.0
    mask = rng.random((n, n)) < extra
    d = np.maximum(d, np.maximum(mask, mask.T).astype(np.float32))
    np.fill_diagonal(d, 0.0)
    # shuffle vertex ids so RCM has work to do
    p = rng.permutation(n)
    return d[np.ix_(p, p)]


def test_rcm_dist_matches_local():
    d = _sym_banded(40, 3)
    a = SpCOO.from_dense(d)
    g = ProcGrid.make()
    A = DistSpMat.from_local(a, g)
    o_local = np.asarray(rcm_order(a))
    o_dist = rcm_order_dist(A)
    # both must be permutations with the same (good) bandwidth profile
    np.testing.assert_array_equal(np.sort(o_dist), np.arange(40))
    bw_l = bandwidth(d, o_local)
    bw_d = bandwidth(d, o_dist)
    bw_orig = bandwidth(d, np.arange(40))
    assert bw_d <= bw_orig
    # near-identical quality; exact orders differ only in the parent rule
    # (dist uses the reference's min-neighbor-order SelectMinSR, RCM.cpp:361;
    # local orders by BFS-parent position)
    assert bw_d <= bw_l + 3


def test_rcm_dist_disconnected():
    n = 24
    d = np.zeros((n, n), np.float32)
    for i in range(10):
        d[i, (i + 1) % 11] = d[(i + 1) % 11, i] = 1.0
    for i in range(12, n - 1):
        d[i, i + 1] = d[i + 1, i] = 1.0
    A = DistSpMat.from_local(SpCOO.from_dense(d), ProcGrid.make())
    o = rcm_order_dist(A)
    np.testing.assert_array_equal(np.sort(o), np.arange(n))


def test_md_order_dist_matches_local():
    """Distributed MD (MD.cpp:290) == the local quotient-graph MD, ties by
    vertex id."""
    import jax
    from combblas_tpu.models.ordering import md_order, md_order_dist
    from combblas_tpu.parallel.dist import DistSpMat
    from combblas_tpu.parallel.grid import ProcGrid
    from combblas_tpu.ops.coo import SpCOO
    from tests.test_coo import rand_sparse

    n = 18
    d = rand_sparse(n, n, 0.18, seed=9)
    d = ((d + d.T) > 0).astype(np.float32)
    np.fill_diagonal(d, 0.0)
    g = ProcGrid.make(2, 2, devices=jax.devices()[:4])
    A = DistSpMat.from_local(SpCOO.from_dense(d), g)
    o_local = np.asarray(md_order(SpCOO.from_dense(d)))
    o_dist = np.asarray(md_order_dist(A))
    np.testing.assert_array_equal(o_dist, o_local)
