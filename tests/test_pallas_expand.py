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


def test_compress_kernel_multitile_spanning():
    """Segments spanning compress-kernel tile boundaries (32768 elements)
    must fold the cross-tile carry exactly."""
    import jax.numpy as jnp

    from combblas_tpu.ops.pallas.compress_kernel import (
        compress_sorted_packed_pallas,
    )

    sent = np.iinfo(np.int32).max
    n = 3 * 32768
    rng = np.random.default_rng(7)
    nreal = 70000
    keys = np.sort(rng.integers(0, 20000, nreal).astype(np.int32))
    # force a segment spanning the first tile boundary
    keys[32768 - 5: 32768 + 5] = keys[32768 - 5]
    keys = np.sort(keys)
    vals = rng.random(nreal).astype(np.float32)
    K = np.full(n, sent, np.int32)
    V = np.zeros(n, np.float32)
    K[:nreal] = keys
    V[:nreal] = vals
    ok, ov, nnz = compress_sorted_packed_pallas(
        jnp.asarray(K), jnp.asarray(V), PLUS_TIMES, out_capacity=1 << 15,
        interpret=True)
    uk, inv = np.unique(keys, return_inverse=True)
    ref = np.zeros(len(uk), np.float64)
    np.add.at(ref, inv, vals.astype(np.float64))
    assert int(nnz) == len(uk)
    np.testing.assert_array_equal(np.asarray(ok)[: len(uk)], uk)
    np.testing.assert_allclose(np.asarray(ov)[: len(uk)], ref, rtol=1e-5)


def test_pallas_rowchunked_matches_dense():
    from combblas_tpu.ops.spgemm import spgemm_pallas_rowchunked

    m, k, n = 200, 160, 120
    ad = _rand(m, k, 0.05, 11)
    bd = _rand(k, n, 0.05, 12)
    a = SpCOO.from_dense(ad)
    b = SpCOO.from_dense(bd)
    c = spgemm_pallas_rowchunked(a, b, PLUS_TIMES, num_slabs=4,
                                 out_capacity=1 << 14, interpret=True)
    np.testing.assert_allclose(np.asarray(c.to_dense()), ad @ bd,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("density", [0.02, 0.15])
def test_pallas_compact_stream_matches_dense(density):
    from combblas_tpu.ops.spgemm import stream_capacity

    m, k, n = 96, 80, 64
    ad = _rand(m, k, density, 21)
    bd = _rand(k, n, density, 22)
    a = SpCOO.from_dense(ad)
    b = SpCOO.from_dense(bd)
    chunk_cap, out_cap = spgemm_pallas_bounds(a, b)
    import jax.numpy as jnp

    from combblas_tpu.ops.spgemm import spgemm_flops

    scap = stream_capacity(int(spgemm_flops(a, b)))
    c = spgemm_pallas(a, b, PLUS_TIMES, chunk_cap=chunk_cap,
                      out_capacity=out_cap, stream_cap=scap, interpret=True)
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), ad @ bd, rtol=1e-5, atol=1e-5
    )
