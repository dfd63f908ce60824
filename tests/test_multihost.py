"""Multi-host scaffolding (parallel/multihost.py) — single-process degenerate
case (the only case testable without a pod; SURVEY §2.5 hybrid-launch row)."""

import jax
import numpy as np

from combblas_tpu.parallel.grid import ProcGrid, default_grid
from combblas_tpu.parallel.multihost import (
    global_put,
    initialize_multihost,
    is_coordinator,
    pod_grid,
)


def test_initialize_noop_single_process():
    assert initialize_multihost() == 1
    assert is_coordinator()


def test_pod_grid_matches_default():
    g = pod_grid()
    d = default_grid()
    assert g.pr == d.pr and g.pc == d.pc and g.nprocs == d.nprocs


def test_pod_grid_layers():
    g = pod_grid(layers=2)
    assert g.is3d and g.layers == 2 and g.nprocs == len(jax.devices())


def test_global_put_roundtrip():
    g = pod_grid()
    x = np.arange(g.nprocs * 4, dtype=np.float32)
    arr = global_put(x, g.vec_sharding())
    np.testing.assert_array_equal(np.asarray(arr), x)
    # and through a matrix constructor on the pod grid (degenerate = normal)
    from combblas_tpu import SpCOO
    from combblas_tpu.parallel.dist import DistSpMat

    d = np.eye(8, dtype=np.float32)
    A = DistSpMat.from_local(SpCOO.from_dense(d), pod_grid())
    np.testing.assert_array_equal(A.to_dense(), d)
