"""Distributed filtered/semantic traversals vs local twins on the 8-device
mesh (FilteredBFS.cpp:129, FilteredMIS.cpp:147, SemanticGraph.h)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from combblas_tpu import SpCOO
from combblas_tpu.models.filtered import (
    bfs_filtered,
    bfs_filtered_dist,
    materialize_filtered_dist,
    mis_filtered_dist,
)
from combblas_tpu.models.semantic import (
    TwitterGraph,
    tweet_within_interval,
)
from combblas_tpu.parallel.dist import DistSpMat
from combblas_tpu.parallel.grid import ProcGrid


@pytest.fixture(scope="module")
def grid():
    return ProcGrid.make()


def _twitter(n, seed, min_count=0):
    rng = np.random.default_rng(seed)
    mask = rng.random((n, n)) < 0.2
    mask = np.maximum(mask, mask.T)
    np.fill_diagonal(mask, False)
    src, dst = np.nonzero(mask)
    follower = rng.random(src.size) < 0.5
    count = rng.integers(min_count, 5, src.size)
    latest = rng.integers(0, 100, src.size)
    return TwitterGraph.build(src, dst, follower, count, latest, n)


def test_bfs_filtered_dist_matches_local(grid):
    n = 32
    tg = _twitter(n, 50)
    pred = tweet_within_interval(10, 80)
    p_l, l_l = bfs_filtered(tg.mat, 0, pred)
    A = tg.distribute(grid)
    p_d, l_d = bfs_filtered_dist(A, 0, pred)
    np.testing.assert_array_equal(np.asarray(l_d)[:n], np.asarray(l_l)[:n])
    # and via the TwitterGraph convenience
    p2, l2 = tg.bfs_within_dist(grid, 0, 10, 80)
    np.testing.assert_array_equal(np.asarray(l2)[:n], np.asarray(l_l)[:n])


def test_materialize_filtered_dist(grid):
    n = 24
    tg = _twitter(n, 51)
    pred = tweet_within_interval(20, 60)
    A = tg.distribute(grid)
    sub = materialize_filtered_dist(A, pred)
    from combblas_tpu.models.filtered import materialize_filtered

    ref = materialize_filtered(tg.mat, pred)
    np.testing.assert_allclose(sub.to_dense(), np.asarray(ref.to_dense()))


def test_mis_filtered_dist_valid(grid):
    n = 32
    # count>=1 so tweet_within_interval(0,99) truly passes EVERY edge (the
    # predicate requires cnt>0) and the filtered graph stays symmetric —
    # Luby needs an undirected graph (FilteredMIS.cpp generates symmetric ER)
    tg = _twitter(n, 52, min_count=1)
    pred = tweet_within_interval(0, 99)  # everything passes: plain MIS
    A = tg.distribute(grid)
    mem = np.asarray(mis_filtered_dist(A, jax.random.PRNGKey(0), pred))[:n]
    d = np.asarray(tg.mat.to_dense()) != 0
    # independence
    for i in np.nonzero(mem)[0]:
        for j in np.nonzero(mem)[0]:
            if i != j:
                assert not d[i, j]
    # maximality: every non-member has a member neighbor
    for v in np.nonzero(~mem)[0]:
        assert d[v, mem].any() or not d[v].any()
