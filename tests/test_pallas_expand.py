"""Pallas segment-DMA expansion kernel vs the XLA ESC path (interpret mode).

The kernel itself targets TPU; under the CPU test mesh it runs through the
Pallas interpreter, which exercises the same chunk metadata, DMA slicing,
lane realignment, and sentinel masking logic.
"""
import jax
import numpy as np
import pytest

from combblas_tpu.ops.coo import SpCOO
from combblas_tpu.ops.spgemm import (
    spgemm_auto,
    spgemm_pallas,
    spgemm_pallas_bounds,
)
from combblas_tpu.semiring import MIN_PLUS, PLUS_TIMES


def _rand(m, k, density, seed):
    rng = np.random.default_rng(seed)
    d = (rng.random((m, k)) < density) * rng.random((m, k))
    return d.astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("density", [0.02, 0.15])
def test_pallas_matches_dense(seed, density):
    m, k, n = 96, 80, 64
    ad = _rand(m, k, density, seed)
    bd = _rand(k, n, density, seed + 10)
    a = SpCOO.from_dense(ad)
    b = SpCOO.from_dense(bd)
    chunk_cap, out_cap = spgemm_pallas_bounds(a, b)
    c = spgemm_pallas(a, b, PLUS_TIMES, chunk_cap=chunk_cap,
                      out_capacity=out_cap, interpret=True)
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), ad @ bd, rtol=1e-5, atol=1e-5
    )


def test_pallas_matches_xla_minplus():
    m = k = n = 48
    ad = _rand(m, k, 0.1, 3)
    bd = _rand(k, n, 0.1, 4)
    a = SpCOO.from_dense(ad)
    b = SpCOO.from_dense(bd)
    chunk_cap, out_cap = spgemm_pallas_bounds(a, b)
    cp = spgemm_pallas(a, b, MIN_PLUS, chunk_cap=chunk_cap,
                       out_capacity=out_cap, interpret=True)
    cx = spgemm_auto(a, b, MIN_PLUS)
    np.testing.assert_allclose(
        np.asarray(cp.to_dense()), np.asarray(cx.to_dense()), rtol=1e-6
    )


def test_pallas_empty_rows_and_sentinels():
    # rows of A hitting empty B rows, plus an empty A tail
    m, k, n = 16, 32, 24
    ad = np.zeros((m, k), np.float32)
    ad[0, 5] = 2.0   # B row 5 empty
    ad[3, 7] = 1.5
    ad[9, 7] = -1.0
    bd = np.zeros((k, n), np.float32)
    bd[7, [0, 5, 23]] = [1.0, 2.0, 3.0]
    a = SpCOO.from_dense(ad)
    b = SpCOO.from_dense(bd)
    chunk_cap, out_cap = spgemm_pallas_bounds(a, b)
    c = spgemm_pallas(a, b, PLUS_TIMES, chunk_cap=chunk_cap,
                      out_capacity=out_cap, interpret=True)
    np.testing.assert_allclose(np.asarray(c.to_dense()), ad @ bd, rtol=1e-6)
    assert int(c.nnz) == 6
