"""Distributed dense matrix helpers and dist_spmm vs dense reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from combblas_tpu import SpCOO
from combblas_tpu.parallel.grid import ProcGrid
from combblas_tpu.parallel.dist import DistSpMat, block_dims, col_vec_len
from combblas_tpu.parallel.dense import (
    dense_add_sparse,
    dense_put,
    dense_reduce,
    dense_to_host,
    dist_spmm,
)
from tests.test_coo import rand_sparse


def grid22():
    return ProcGrid.make(2, 2, devices=jax.devices()[:4])


def test_dense_roundtrip_and_reduce():
    g = grid22()
    x = np.random.default_rng(0).random((10, 14)).astype(np.float32)
    xd = dense_put(x, g)
    np.testing.assert_allclose(dense_to_host(xd, (10, 14)), x, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dense_reduce(xd, "row"))[:10], x.sum(1), rtol=1e-5
    )


def test_dist_spmm():
    g = grid22()
    d = rand_sparse(18, 12, 0.4, seed=110)
    A = DistSpMat.from_local(SpCOO.from_dense(d), g)
    rng = np.random.default_rng(1)
    feat = 8
    x = rng.random((12, feat)).astype(np.float32)
    xp = np.zeros((col_vec_len(d.shape, g), feat), np.float32)
    xp[:12] = x
    y = np.asarray(dist_spmm(A, jnp.asarray(xp)))
    np.testing.assert_allclose(y[:18], d @ x, rtol=1e-4, atol=1e-6)


def test_dense_add_sparse():
    g = grid22()
    d = rand_sparse(12, 12, 0.3, seed=111)
    A = DistSpMat.from_local(SpCOO.from_dense(d), g)
    from jax.sharding import NamedSharding, PartitionSpec as P

    mb, nb = block_dims((12, 12), g)
    x = np.ones((g.pr * mb, g.pc * nb), np.float32)
    xd = jax.device_put(x, NamedSharding(g.mesh, P("r", "c")))
    out = np.asarray(dense_add_sparse(xd, A))
    np.testing.assert_allclose(out[:12, :12], 1.0 + d, rtol=1e-6)
