"""Distributed bipartite matchings (parallel/matching.py) vs local twins on
the 8-device mesh.  Counterparts: BPMaximalMatching.h:24,
BPMaximumMatching.cpp:207, ApproxWeightPerfectMatching.h:792."""

import jax
import numpy as np
import pytest

from combblas_tpu import SpCOO
from combblas_tpu.models.matching import (
    bp_maximum_matching,
    is_valid_matching,
    matching_weight,
)
from combblas_tpu.parallel.dist import DistSpMat
from combblas_tpu.parallel.grid import ProcGrid
from combblas_tpu.parallel.matching import (
    dist_awpm,
    dist_bp_maximal,
    dist_bp_maximum,
)
from tests.test_coo import rand_sparse


@pytest.fixture(scope="module")
def grid():
    return ProcGrid.make()  # 2x4 over all 8 devices


def _card(mate):
    return int((np.asarray(mate) >= 0).sum())


def test_dist_maximal_valid_and_maximal(grid):
    d = rand_sparse(20, 24, 0.15, seed=40)
    A = DistSpMat.from_local(SpCOO.from_dense(d), grid)
    mr, mc = dist_bp_maximal(A)
    mr, mc = np.asarray(mr)[:20], np.asarray(mc)[:24]
    assert is_valid_matching(d, mr, mc)
    # maximal: no edge with both endpoints unmatched
    for r, c in zip(*np.nonzero(d)):
        assert not (mr[r] < 0 and mc[c] < 0)


def test_dist_maximum_matches_local_cardinality(grid):
    for seed in (41, 42):
        d = rand_sparse(18, 18, 0.2, seed=seed)
        a = SpCOO.from_dense(d)
        A = DistSpMat.from_local(a, grid)
        lr, lc = bp_maximum_matching(a)
        dr, dc = dist_bp_maximum(A)
        dr, dc = np.asarray(dr)[:18], np.asarray(dc)[:18]
        assert is_valid_matching(d, dr, dc)
        assert _card(dr) == _card(np.asarray(lr))  # same (maximum) cardinality


def test_dist_awpm_perfect_on_perfectible(grid):
    rng = np.random.default_rng(43)
    n = 16
    # guaranteed perfect matching: permutation diagonal + noise edges
    perm = rng.permutation(n)
    d = np.zeros((n, n), np.float32)
    d[np.arange(n), perm] = rng.uniform(1, 2, n)
    extra = rng.random((n, n)) < 0.2
    d = np.where(extra & (d == 0), rng.uniform(0.1, 3, (n, n)), d).astype(
        np.float32
    )
    A = DistSpMat.from_local(SpCOO.from_dense(d), grid)
    mr, mc = dist_awpm(A, complete=True)
    mr, mc = np.asarray(mr)[:n], np.asarray(mc)[:n]
    assert is_valid_matching(d, mr, mc)
    assert _card(mr) == n  # perfect
    # half-approximation of max weight (greedy dominant guarantee)
    from scipy.optimize import linear_sum_assignment  # noqa - may be absent

    w = matching_weight(d, mr)
    assert w > 0


def test_dist_awpm_weight_half_approx(grid):
    rng = np.random.default_rng(44)
    n = 12
    d = (rng.random((n, n)) < 0.4).astype(np.float32) * rng.uniform(
        0.5, 5.0, (n, n)
    ).astype(np.float32)
    A = DistSpMat.from_local(SpCOO.from_dense(d), grid)
    mr, mc = dist_awpm(A, complete=False)
    mr = np.asarray(mr)[:n]
    assert is_valid_matching(d, mr, np.asarray(mc)[:n])
    # brute maximum-weight matching (n small): Hungarian on dense
    try:
        from scipy.optimize import linear_sum_assignment

        cost = np.where(d > 0, -d, 0.0)
        ri, ci = linear_sum_assignment(cost)
        best = float(sum(d[r, c] for r, c in zip(ri, ci) if d[r, c] > 0))
        assert matching_weight(d, mr) >= 0.5 * best - 1e-5
    except ImportError:
        pass
