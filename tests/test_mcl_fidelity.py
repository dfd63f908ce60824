"""MCL pipeline fidelity: Kselect2 vs Kselect1 cross-validation
(SpParMat.cpp:130,309,1120), per-phase MCLPruneRecoverySelect
(ParFriends.h:186,698), RemoveIsolated/RandPermute preprocessing
(MCL.cpp:477-497)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from combblas_tpu import SpCOO
from combblas_tpu.models.mcl import (
    MCLParams,
    dist_mcl_prune,
    dist_rand_permute,
    dist_remove_isolated,
    mcl_dist,
)
from combblas_tpu.parallel.dist import DistSpMat
from combblas_tpu.parallel.elementwise import (
    dist_kselect2_col,
    dist_kselect_col,
    dist_kselect_col_checked,
)
from combblas_tpu.parallel.grid import ProcGrid
from combblas_tpu.parallel.memefficient import mem_efficient_spgemm
from tests.test_apps import two_components
from tests.test_coo import rand_sparse


@pytest.fixture(scope="module")
def grid():
    return ProcGrid.make(2, 2, devices=jax.devices()[:4])


def _kth_largest_dense(d, k):
    out = np.full(d.shape[1], -np.inf, np.float32)
    for j in range(d.shape[1]):
        colv = d[:, j][d[:, j] != 0]
        kk = int(k[j]) if np.ndim(k) else int(k)
        if kk > 0 and len(colv) >= kk:
            out[j] = np.sort(colv)[::-1][kk - 1]
    return out


def test_kselect2_matches_kselect1_scalar_k(grid):
    d = rand_sparse(24, 20, 0.4, seed=7)
    A = DistSpMat.from_local(SpCOO.from_dense(d), grid)
    for k in (1, 3, 8):
        v1 = np.asarray(dist_kselect_col(A, k))[:20]
        v2 = np.asarray(dist_kselect2_col(A, k))[:20]
        ref = _kth_largest_dense(d, np.full(20, k))
        np.testing.assert_allclose(v1, ref)
        np.testing.assert_allclose(v2, ref)


def test_kselect2_per_column_varying_k(grid):
    d = rand_sparse(24, 20, 0.5, seed=8)
    A = DistSpMat.from_local(SpCOO.from_dense(d), grid)
    from combblas_tpu.parallel.dist import block_dims

    rng = np.random.default_rng(0)
    nb = A.grid.pc * block_dims(A.gshape, A.grid)[1]
    k = rng.integers(0, 9, nb).astype(np.int32)
    kv = jnp.asarray(k)
    v2 = np.asarray(dist_kselect2_col(A, kv))[:20]
    ref = _kth_largest_dense(d, k[:20])
    np.testing.assert_allclose(v2, ref)
    checked = np.asarray(dist_kselect_col_checked(A, kv))[:20]
    np.testing.assert_allclose(checked, ref)


def test_kselect2_negative_values(grid):
    d = rand_sparse(16, 12, 0.5, seed=9) - 0.5  # mixed signs
    d[d == -0.5] = 0.0
    A = DistSpMat.from_local(SpCOO.from_dense(d), grid)
    v2 = np.asarray(dist_kselect2_col(A, 2))[:12]
    ref = _kth_largest_dense(d, np.full(12, 2))
    np.testing.assert_allclose(v2, ref)


def test_phased_prune_hook_matches_unphased(grid):
    # pruning is column-local, so per-phase pruning (column slabs) must equal
    # pruning the full product — the ParFriends.h:698 semantics.
    d = rand_sparse(16, 16, 0.5, seed=10)
    A = DistSpMat.from_local(SpCOO.from_dense(d), grid)
    p = MCLParams(cutoff=0.05, select=3, recover_num=2, recover_pct=0.2)

    def hook(c):
        return dist_mcl_prune(c, p)

    c1 = mem_efficient_spgemm(A, A, phases=1, phase_hook=hook)
    c2 = mem_efficient_spgemm(A, A, phases=3, phase_hook=hook)
    np.testing.assert_allclose(c2.to_dense(), c1.to_dense(), rtol=1e-5)
    # and the hook did prune something
    assert int(c1.total_nnz()) < int(
        mem_efficient_spgemm(A, A, phases=1).total_nnz()
    )


def test_remove_isolated_and_randpermute(grid):
    n = 16
    d = np.zeros((n, n), np.float32)
    d[:6, :6] = two_components(12)[:6, :6] + np.eye(6)
    d[8:12, 8:12] = 1.0  # vertices 6,7 and 12..15 isolated
    A = DistSpMat.from_local(SpCOO.from_dense(d), grid)
    B, vmap, n_keep = dist_remove_isolated(A)
    assert n_keep == 10
    kept = vmap >= 0
    np.testing.assert_array_equal(
        np.nonzero(kept)[0], [0, 1, 2, 3, 4, 5, 8, 9, 10, 11]
    )
    bd = B.to_dense()
    np.testing.assert_allclose(
        bd[:n_keep, :n_keep], d[np.ix_(kept, kept)]
    )
    C, perm = dist_rand_permute(B, jax.random.PRNGKey(1))
    cd = C.to_dense()
    ref = np.zeros_like(bd)
    ref[np.ix_(perm, perm)] = bd
    np.testing.assert_allclose(cd, ref)


def test_mcl_dist_preprocess_and_kselect2(grid):
    n = 16
    d = np.zeros((n, n), np.float32)
    two = two_components(12) + np.eye(12, dtype=np.float32)
    d[:12, :12] = two  # vertices 12..15 isolated
    A = DistSpMat.from_local(SpCOO.from_dense(d), grid)
    labels, iters = mcl_dist(
        A, MCLParams(max_iters=30, add_self_loops=False),
        preprocess=True, use_kselect2=True,
    )
    l = np.asarray(labels)[:n]
    # two cliques cluster together; isolated vertices are singletons
    assert np.all(l[:6] == l[0]) and np.all(l[6:12] == l[6])
    assert l[0] != l[6]
    iso = l[12:]
    assert len(np.unique(iso)) == 4
    assert not np.isin(iso, l[:12]).any()
