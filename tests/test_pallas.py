"""Pallas kernels in interpreter mode vs jnp references (compiled TPU runs
are exercised by bench.py on hardware)."""

import numpy as np
import jax.numpy as jnp
import pytest

from combblas_tpu import SpCOO
from combblas_tpu.ops.pallas.spmm_kernel import spmm_pallas
from combblas_tpu.ops.spmv import spmm
from tests.test_coo import rand_sparse


def test_spmm_pallas_matches_jnp():
    d = rand_sparse(16, 12, 0.4, seed=120)
    x = np.random.default_rng(2).random((12, 8)).astype(np.float32)
    a = SpCOO.from_dense(d)
    y_ref = np.asarray(spmm(a, jnp.asarray(x)))
    y_pl = np.asarray(spmm_pallas(a, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y_pl, y_ref, rtol=1e-5, atol=1e-6)


def test_spmm_pallas_empty():
    a = SpCOO.empty((6, 5))
    x = np.ones((5, 4), np.float32)
    y = np.asarray(spmm_pallas(a, jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(y, np.zeros((6, 4)))


def test_spmm_pallas_matches_dense():
    import numpy as np
    import jax.numpy as jnp
    from combblas_tpu.ops.coo import SpCOO
    from combblas_tpu.ops.pallas.spmm_kernel import spmm_pallas

    rng = np.random.default_rng(0)
    m, n, d = 300, 257, 128
    ad = (rng.random((m, n)) < 0.05) * rng.random((m, n))
    ad[7] = (rng.random(n) < 0.6) * 1.0  # heavy row (multi-group run)
    ad[8] = 0                            # empty row
    ad = ad.astype(np.float32)
    a = SpCOO.from_dense(ad)
    x = rng.random((n, d)).astype(np.float32)
    y = np.asarray(spmm_pallas(a, jnp.asarray(x), interpret=True))
    ref = ad @ x
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


def test_spmm_ell_matches_dense():
    """Degree-sorted ELL-8 kernel (the spmm fast path) vs dense, with a
    heavy row, empty rows, and non-multiple-of-8 m."""
    from combblas_tpu.ops.pallas.spmm_ell import spmm_ell, spmm_ell_prepare

    rng = np.random.default_rng(1)
    m, n, d = 301, 257, 128
    ad = ((rng.random((m, n)) < 0.05) * rng.random((m, n))).astype(np.float32)
    ad[7] = ((rng.random(n) < 0.6) * 1.0).astype(np.float32)  # hub row
    ad[8] = 0                                                 # empty row
    x = rng.random((n, d)).astype(np.float32)
    a = SpCOO.from_dense(ad)
    prep = spmm_ell_prepare(a)
    y = np.asarray(spmm_ell(a, jnp.asarray(x), prep=prep, interpret=True))
    np.testing.assert_allclose(y, ad @ x, rtol=2e-5, atol=1e-5)
    # narrow d pads lanes internally
    y8 = np.asarray(spmm_ell(a, jnp.asarray(x[:, :8]), prep=prep,
                             interpret=True))
    np.testing.assert_allclose(y8, ad @ x[:, :8], rtol=2e-5, atol=1e-5)


def test_spmm_gate_prefers_xla_for_non_plus_times():
    """ADVICE r4: the use_pallas gate must not route non-plus_times
    semirings (or f64) through the float32 plus_times kernel."""
    from combblas_tpu.semiring import MIN_PLUS

    d = rand_sparse(16, 12, 0.4, seed=7)
    x = np.random.default_rng(3).random((12, 4)).astype(np.float32)
    a = SpCOO.from_dense(d)
    y_min = np.asarray(spmm(a, jnp.asarray(x), MIN_PLUS, use_pallas=True))
    y_ref = np.asarray(spmm(a, jnp.asarray(x), MIN_PLUS))
    np.testing.assert_allclose(y_min, y_ref, rtol=1e-5, atol=1e-6)


def test_spmm_ell_blocked_matches_dense():
    """2D-blocked ELL-8 kernel (sum fold) vs dense, rectangular + narrow d."""
    from combblas_tpu.ops.pallas.spmm_ell_blocked import spmm_ell_blocked

    rng = np.random.default_rng(4)
    for (m, n, dens, d, nb) in ((64, 48, 0.2, 128, 2), (150, 150, 0.08, 16, 3),
                                (90, 64, 0.15, 128, 4)):
        ad = ((rng.random((m, n)) < dens) * rng.random((m, n))).astype(
            np.float32)
        x = rng.random((n, d)).astype(np.float32)
        a = SpCOO.from_dense(ad)
        y = spmm_ell_blocked(a, jnp.asarray(x), nb=nb, interpret=True)
        np.testing.assert_allclose(np.asarray(y), ad @ x, rtol=2e-5,
                                   atol=1e-5)


def test_spmm_ell_blocked_max_fold():
    """Max fold with relabeled columns (the BFS sweep configuration)."""
    from combblas_tpu.ops.pallas.spmm_ell_blocked import (
        ell_blocked_prepare,
        spmm_ell_blocked,
    )

    rng = np.random.default_rng(5)
    m = 120
    ad = ((rng.random((m, m)) < 0.1) * 1.0).astype(np.float32)
    ad = np.maximum(ad, ad.T)
    np.fill_diagonal(ad, 0)
    a = SpCOO.from_dense(ad)
    prep = ell_blocked_prepare(a, nb=3, relabel_cols=True, binary=True)
    order = np.asarray(prep["order"])
    rank = np.asarray(prep["inv"])
    x = np.zeros((m, 128), np.float32)
    x[:, :5] = rng.random((m, 5)).astype(np.float32)
    xs = x[order[order >= 0]] if (order < 0).any() else x[order]
    xs = np.zeros((prep["n_pad"], 128), np.float32)
    xs[rank] = x
    y = spmm_ell_blocked(a, jnp.asarray(xs), prep=prep, op="max",
                         interpret=True)
    ref = np.zeros((m, 128), np.float32)
    for v in range(m):
        nbrs = np.flatnonzero(ad[v])
        if len(nbrs):
            ref[v] = x[nbrs].max(axis=0)
    np.testing.assert_allclose(np.asarray(y)[rank], ref, rtol=1e-6,
                               atol=1e-6)
