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
