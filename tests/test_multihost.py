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


def test_two_process_pod():
    """The real multi-process exercise (VERDICT r2 item 6): two CPU
    controllers joined by jax.distributed.initialize, one 2x2 pod grid,
    global_put + SUMMA SpGEMM across the process boundary — the reference's
    ``mpiexec -n 4`` CTest pattern."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    here = os.path.dirname(__file__)
    worker = os.path.join(here, "_multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device counts
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", addr],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-3000:]}"
    assert any("MULTIHOST_OK" in out for _, out, _ in outs), outs
