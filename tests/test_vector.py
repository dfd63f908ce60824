"""Distributed vector machinery (parallel/vector.py) on the 8-device mesh.

Counterparts: FullyDistSpVec::sort (FullyDistSpVec.cpp:859 via usort
par::sampleSort), FullyDistVec::RandPerm, Invert (FullyDistSpVec.h:89),
Uniq (FullyDistSpVec.cpp:1029), and the SparseCommon owner shuffle
(SpParMat.cpp:2893) = dist_route.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from combblas_tpu.parallel.grid import ProcGrid
from combblas_tpu.parallel.vector import (
    dist_apply_perm,
    dist_invert,
    dist_rand_perm,
    dist_route,
    dist_sort,
    dist_uniq,
)


@pytest.fixture(scope="module")
def grid():
    return ProcGrid.make()


def _put(x, grid):
    from combblas_tpu.parallel.dist import dist_vec

    return dist_vec(np.asarray(x), grid)


def test_dist_sort_ints(grid):
    rng = np.random.default_rng(0)
    n = 800
    x = rng.integers(-1000, 1000, n).astype(np.int32)
    xs = dist_sort(_put(x, grid), grid, length=n)
    np.testing.assert_array_equal(np.asarray(xs)[:n], np.sort(x))


def test_dist_sort_floats_with_payload(grid):
    rng = np.random.default_rng(1)
    n = 513  # deliberately not a multiple of p
    x = rng.standard_normal(n).astype(np.float32)
    pay = np.arange(n, dtype=np.int32)
    xs, ps = dist_sort(_put(x, grid), grid, _put(pay, grid), length=n)
    order = np.argsort(x, kind="stable")
    np.testing.assert_allclose(np.asarray(xs)[:n], x[order])
    np.testing.assert_array_equal(np.asarray(ps)[:n], order)


def test_dist_sort_descending_and_ties(grid):
    n = 640
    x = np.tile(np.arange(10, dtype=np.int32), n // 10)  # heavy ties
    xs, ps = dist_sort(
        _put(x, grid), grid, _put(np.arange(n, dtype=np.int32), grid),
        length=n, descending=True,
    )
    np.testing.assert_array_equal(np.asarray(xs)[:n], np.sort(x)[::-1])
    # stability within ties: payload indices increase within each tie run
    got = np.asarray(ps)[:n]
    vals = np.asarray(xs)[:n]
    for v in range(10):
        seg = got[vals == v]
        assert np.all(np.diff(seg) > 0)


def test_dist_sort_skewed(grid):
    # all elements equal: splitter balance must not matter for correctness
    n = 512
    x = np.full(n, 7, np.int32)
    xs, ps = dist_sort(
        _put(x, grid), grid, _put(np.arange(n, dtype=np.int32), grid),
        length=n,
    )
    np.testing.assert_array_equal(np.asarray(xs)[:n], x)
    np.testing.assert_array_equal(np.asarray(ps)[:n], np.arange(n))


def test_dist_rand_perm(grid):
    n = 777
    perm = dist_rand_perm(jax.random.PRNGKey(3), n, grid)
    got = np.asarray(perm)
    assert np.all(got[n:] == n)  # padding sentinel
    np.testing.assert_array_equal(np.sort(got[:n]), np.arange(n))
    # actually shuffled
    assert not np.array_equal(got[:n], np.arange(n))


def test_dist_route_set_and_sum(grid):
    n = 160
    idx = np.array([5, 17, 5, 159, 0] + [n] * (n - 5), np.int32)
    val = np.array([1.0, 2.0, 3.0, 4.0, 5.0] + [0.0] * (n - 5), np.float32)
    mask = idx < n
    init = jnp.zeros((n,), jnp.float32)
    out, hit = dist_route(
        _put(idx, grid), _put(val, grid), _put(mask, grid),
        _put(np.zeros(n, np.float32), grid), grid, combine="sum",
    )
    out = np.asarray(out)
    hit = np.asarray(hit)
    assert out[5] == 4.0 and out[17] == 2.0 and out[159] == 4.0 and out[0] == 5.0
    assert hit[5] and hit[17] and not hit[33]


def test_dist_apply_perm(grid):
    rng = np.random.default_rng(5)
    n = 320
    perm = rng.permutation(n).astype(np.int32)
    x = rng.standard_normal(n).astype(np.float32)
    y = dist_apply_perm(_put(x, grid), _put(perm, grid), grid)
    ref = np.zeros(n, np.float32)
    ref[perm] = x
    np.testing.assert_allclose(np.asarray(y)[:n], ref)


def test_dist_invert(grid):
    n = 256
    # sparse vector: val[i] = some index; invert maps value -> index
    mask = np.zeros(n, bool)
    val = np.zeros(n, np.int32)
    entries = {3: 100, 77: 5, 200: 255}
    for i, v in entries.items():
        mask[i] = True
        val[i] = v
    out, hit = dist_invert(_put(val, grid), _put(mask, grid), grid)
    out, hit = np.asarray(out), np.asarray(hit)
    for i, v in entries.items():
        assert hit[v] and out[v] == i
    assert not hit[50]


def test_dist_uniq(grid):
    n = 256
    rng = np.random.default_rng(7)
    mask = rng.random(n) < 0.5
    val = rng.integers(0, 20, n).astype(np.int32)  # many duplicate values
    out, hit = dist_uniq(_put(val, grid), _put(mask, grid), grid)
    out, hit = np.asarray(out)[:n], np.asarray(hit)[:n]
    # reference: keep smallest index per distinct value
    ref_keep = {}
    for i in np.nonzero(mask)[0]:
        ref_keep.setdefault(int(val[i]), int(i))
    keep_idx = sorted(ref_keep.values())
    np.testing.assert_array_equal(np.nonzero(hit)[0], keep_idx)
    for v, i in ref_keep.items():
        assert out[i] == np.float32(v) or out[i] == v


def test_dist_sort_large_random(grid):
    rng = np.random.default_rng(11)
    n = 8192
    x = rng.integers(0, 1 << 30, n).astype(np.int32)
    xs = dist_sort(_put(x, grid), grid, length=n)
    np.testing.assert_array_equal(np.asarray(xs)[:n], np.sort(x))


def test_dist_gather(grid):
    rng = np.random.default_rng(13)
    n = 320
    x = rng.standard_normal(n).astype(np.float32)
    idx = rng.integers(-5, n + 5, n).astype(np.int32)  # some out of range
    from combblas_tpu.parallel.vector import dist_gather

    out = dist_gather(_put(x, grid), _put(idx, grid), grid)
    ref = np.where((idx >= 0) & (idx < n), x[np.clip(idx, 0, n - 1)], 0.0)
    np.testing.assert_allclose(np.asarray(out)[:n], ref)


def test_dist_sort_auto_matches_and_bounds(grid):
    """Count-bounded sample sort (VERDICT r2 item 8): results identical to
    dist_sort/np.sort across benign AND deliberately skewed distributions,
    with the planning pass showing an O(max_bucket) exchange buffer for
    benign inputs."""
    from combblas_tpu.parallel.vector import _sort_plan, dist_sort_auto

    n = 800
    p = grid.nprocs
    rng = np.random.default_rng(7)
    cases = {
        "uniform": rng.integers(-1000, 1000, n).astype(np.int32),
        "sorted": np.arange(n, dtype=np.int32),      # max per-pair skew
        "reverse": np.arange(n, 0, -1).astype(np.int32),
        "constant": np.full(n, 42, np.int32),
        "zipf": rng.zipf(1.5, n).astype(np.int32),   # heavy duplicates
    }
    for name, x in cases.items():
        xs = dist_sort_auto(_put(x, grid), grid, length=n)
        np.testing.assert_array_equal(
            np.asarray(xs)[:n], np.sort(x), err_msg=name)
    # benign input: max per-(src,dst) bucket is ~chunk/p, far below chunk
    lens_max, mine = _sort_plan(_put(cases["uniform"], grid), grid,
                                length=n)
    chunk = -(-n // p)
    assert int(np.asarray(lens_max).max()) <= 4 * chunk // p + 8


def test_dist_sort_auto_payload(grid):
    from combblas_tpu.parallel.vector import dist_sort_auto

    rng = np.random.default_rng(8)
    n = 640
    x = rng.standard_normal(n).astype(np.float32)
    pay = np.arange(n, dtype=np.int32)
    xs, ps = dist_sort_auto(_put(x, grid), grid, _put(pay, grid), length=n)
    order = np.argsort(x, kind="stable")
    np.testing.assert_allclose(np.asarray(xs)[:n], x[order])
    np.testing.assert_array_equal(np.asarray(ps)[:n], order)
