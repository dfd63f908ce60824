"""Matchings, MIS, RCM, BC vs reference implementations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from combblas_tpu import SpCOO
from tests.test_coo import rand_sparse


def bipartite_graph(m, n, density, seed):
    d = (rand_sparse(m, n, density, seed=seed) != 0).astype(np.float32)
    return d


def hungarian_max_matching_size(d):
    """Reference maximum matching size via simple augmenting search (numpy)."""
    m, n = d.shape
    mate_col = np.full(n, -1)

    def try_kuhn(r, seen):
        for c in range(n):
            if d[r, c] and not seen[c]:
                seen[c] = True
                if mate_col[c] < 0 or try_kuhn(mate_col[c], seen):
                    mate_col[c] = r
                    return True
        return False

    size = 0
    for r in range(m):
        if try_kuhn(r, np.zeros(n, bool)):
            size += 1
    return size


def test_maximal_matching_valid_and_maximal():
    from combblas_tpu.models.matching import bp_maximal_matching, is_valid_matching

    d = bipartite_graph(12, 10, 0.3, 90)
    mr, mc = bp_maximal_matching(SpCOO.from_dense(d))
    mr, mc = np.asarray(mr), np.asarray(mc)
    assert is_valid_matching(d, mr, mc)
    # maximality: no edge between two unmatched vertices
    for r in range(12):
        for c in range(10):
            if d[r, c] and mr[r] < 0 and mc[c] < 0:
                raise AssertionError(f"not maximal: free edge ({r},{c})")


def test_maximum_matching_cardinality():
    from combblas_tpu.models.matching import bp_maximum_matching, is_valid_matching

    for seed in (91, 92, 93):
        d = bipartite_graph(14, 14, 0.18, seed)
        mr, mc = bp_maximum_matching(SpCOO.from_dense(d))
        mr = np.asarray(mr)
        assert is_valid_matching(d, mr, np.asarray(mc))
        got = int((mr >= 0).sum())
        want = hungarian_max_matching_size(d)
        assert got == want, (got, want)


def test_luby_mis():
    from combblas_tpu.models.mis import luby_mis

    d = (rand_sparse(20, 20, 0.15, seed=94) != 0).astype(np.float32)
    d = np.maximum(d, d.T)
    np.fill_diagonal(d, 0)
    mis = np.asarray(luby_mis(SpCOO.from_dense(d), jax.random.PRNGKey(0)))
    # independence
    assert not np.any(d[np.ix_(mis, mis)])
    # maximality: every non-member has a member neighbor
    for v in np.nonzero(~mis)[0]:
        assert d[v][mis].any(), f"vertex {v} could join the MIS"


def test_rcm_reduces_bandwidth():
    from combblas_tpu.models.ordering import rcm_order

    rng = np.random.default_rng(95)
    n = 24
    d = np.zeros((n, n), np.float32)
    for _ in range(60):
        i, j = rng.integers(0, n, 2)
        if i != j:
            d[i, j] = d[j, i] = 1.0
    a = SpCOO.from_dense(d)
    order = np.asarray(rcm_order(a))
    assert sorted(order.tolist()) == list(range(n))  # a permutation
    perm = np.empty(n, int)
    perm[order] = np.arange(n)
    dp = d[np.ix_(order, order)]

    def bandwidth(x):
        ii, jj = np.nonzero(x)
        return int(np.abs(ii - jj).max()) if ii.size else 0

    assert bandwidth(dp) <= bandwidth(d)


def test_betweenness_path_graph():
    from combblas_tpu.models.bc import betweenness_centrality

    # path 0-1-2-3-4: exact BC of middle vertex = 2*( pairs through it )
    n = 5
    d = np.zeros((n, n), np.float32)
    for i in range(n - 1):
        d[i, i + 1] = d[i + 1, i] = 1.0
    bc = betweenness_centrality(SpCOO.from_dense(d), batch_size=5)
    # directed-counts BC on undirected path: vertex v has (v)*(n-1-v) pairs
    # in each direction
    expect = np.array([2 * v * (n - 1 - v) for v in range(n)], float)
    np.testing.assert_allclose(bc, expect, rtol=1e-5)


def test_betweenness_star():
    from combblas_tpu.models.bc import betweenness_centrality

    # star: center 0; all shortest paths between leaves go through 0
    n = 6
    d = np.zeros((n, n), np.float32)
    for i in range(1, n):
        d[0, i] = d[i, 0] = 1.0
    bc = betweenness_centrality(SpCOO.from_dense(d), batch_size=3)
    expect = np.zeros(n)
    expect[0] = (n - 1) * (n - 2)
    np.testing.assert_allclose(bc, expect, atol=1e-5)


def test_awpm_weight_and_perfection():
    from combblas_tpu.models.matching import awpm, is_valid_matching, matching_weight

    rng = np.random.default_rng(96)
    n = 10
    d = rng.random((n, n)).astype(np.float32)
    d[d < 0.3] = 0.0          # keep it dense enough for a perfect matching
    np.fill_diagonal(d, 1.0)  # guarantee a perfect matching exists
    a = SpCOO.from_dense(d)
    mr, mc = awpm(a)
    mr_np = np.asarray(mr)
    assert is_valid_matching(d, mr_np, np.asarray(mc))
    assert (mr_np >= 0).all()  # perfect
    # weight at least half of the max weight (1/2-approx guarantee); compare
    # against greedy upper bound sum of row maxima
    w = matching_weight(d, mr_np)
    assert w >= 0.5 * sum(sorted(d.max(axis=1), reverse=True)[: n]) * 0.5


def test_mis2_and_galerkin():
    from combblas_tpu.models.multigrid import galerkin, mis2, restriction_op

    rng = np.random.default_rng(97)
    n = 24
    d = np.zeros((n, n), np.float32)
    for _ in range(70):
        i, j = rng.integers(0, n, 2)
        if i != j:
            d[i, j] = d[j, i] = rng.random()
    a = SpCOO.from_dense(d)
    ms = np.asarray(mis2(a, jax.random.PRNGKey(3)))
    # independence at distance 2: no two MIS-2 members within two hops
    reach2 = ((d > 0) | ((d > 0) @ (d > 0))).astype(bool)
    sel = np.nonzero(ms)[0]
    for i in sel:
        for j in sel:
            if i != j:
                assert not reach2[i, j], (i, j)
    r = restriction_op(a, jax.random.PRNGKey(3))
    rd = np.asarray(r.to_dense())
    # every fine vertex belongs to exactly one coarse aggregate
    np.testing.assert_array_equal(rd.sum(axis=0), np.ones(n))
    coarse = galerkin(r, a)
    np.testing.assert_allclose(
        np.asarray(coarse.to_dense()), rd @ d @ rd.T, rtol=1e-4, atol=1e-6
    )


def test_filtered_bfs():
    from combblas_tpu.models.bfs import bfs_local
    from combblas_tpu.models.filtered import bfs_filtered, materialize_filtered

    rng = np.random.default_rng(98)
    n = 20
    d = np.zeros((n, n), np.float32)
    for _ in range(80):
        i, j = rng.integers(0, n, 2)
        if i != j:
            w = rng.choice([1.0, 2.0])
            d[i, j] = d[j, i] = w
    a = SpCOO.from_dense(d)

    def keep(v):
        return v > 1.5  # only weight-2 edges

    p1, l1 = bfs_filtered(a, 0, keep)
    sub = materialize_filtered(a, keep)
    p2, l2 = bfs_local(sub, 0)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_bc_dist_matches_local():
    import jax

    from combblas_tpu.models.bc import (
        betweenness_centrality,
        betweenness_centrality_dist,
    )
    from combblas_tpu.parallel.dist import DistSpMat
    from combblas_tpu.parallel.grid import ProcGrid

    d = (rand_sparse(14, 14, 0.2, seed=99) != 0).astype(np.float32)
    d = np.maximum(d, d.T)
    np.fill_diagonal(d, 0)
    a = SpCOO.from_dense(d)
    g = ProcGrid.make(2, 2, devices=jax.devices()[:4])
    A = DistSpMat.from_local(a, g)
    bc_l = betweenness_centrality(a, batch_size=7)
    bc_d = betweenness_centrality_dist(A, batch_size=7)
    np.testing.assert_allclose(bc_d, bc_l, rtol=1e-4, atol=1e-5)


def test_md_order():
    from combblas_tpu.models.ordering import md_order

    # star graph: leaves (degree 1) must be eliminated before the hub
    n = 7
    d = np.zeros((n, n), np.float32)
    for i in range(1, n):
        d[0, i] = d[i, 0] = 1.0
    order = np.asarray(md_order(SpCOO.from_dense(d)))
    assert sorted(order.tolist()) == list(range(n))
    # all leaves (degree 1) are eliminated before the hub reaches a tie —
    # the hub cannot appear among the first n-2 eliminations
    assert 0 not in order[: n - 2]


def test_dist_restriction_galerkin():
    """Distributed MIS-2 / RestrictionOp / Galerkin (RestrictionOp.h:118,197;
    GalerkinNew.cpp:105-112) on the 8-device mesh, cross-checked against the
    dense triple product of the SAME R."""
    import jax
    import jax.numpy as jnp
    from combblas_tpu.models.multigrid import (
        galerkin_dist,
        mis2_dist,
        mis2_verify_dist,
        restriction_op_dist,
    )
    from combblas_tpu.parallel.dist import DistSpMat
    from combblas_tpu.parallel.grid import ProcGrid
    from combblas_tpu.ops.coo import SpCOO
    from tests.test_coo import rand_sparse

    n = 24
    d = rand_sparse(n, n, 0.15, seed=31)
    d = ((d + d.T) > 0).astype(np.float32)
    np.fill_diagonal(d, 0.0)
    g = ProcGrid.make(2, 2, devices=jax.devices()[:4])
    A = DistSpMat.from_local(SpCOO.from_dense(d), g)

    s = mis2_dist(A, jax.random.PRNGKey(3))
    assert mis2_verify_dist(A, s)

    R = restriction_op_dist(A, jax.random.PRNGKey(3))
    rd = np.asarray(R.to_dense())
    # every fine vertex attaches to exactly one coarse vertex
    np.testing.assert_array_equal(rd.sum(axis=0), np.ones(n))
    # attachment stays within distance <= 2 of the coarse seed
    C = galerkin_dist(R, A)
    cd = np.asarray(C.to_dense())
    np.testing.assert_allclose(cd, rd @ d @ rd.T, rtol=1e-5, atol=1e-6)
