"""Worker for the 2-process multi-host test (launched by test_multihost.py).

Each process contributes 2 local CPU devices; ``jax.distributed.initialize``
wires them into one 4-device global mesh — the reference's ``mpiexec -n 4``
CTest pattern, realized as two JAX controllers.  The worker builds the pod
grid, places a matrix with the multi-process constructors (global_put /
make_array_from_callback), runs one SUMMA SpGEMM across the process
boundary, and prints a digest the parent asserts on.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    addr = sys.argv[3]

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from combblas_tpu.parallel.multihost import (
        global_put,
        initialize_multihost,
        is_coordinator,
        pod_grid,
    )

    cnt = initialize_multihost(addr, nproc, pid)
    assert cnt == nproc, f"process_count={cnt}, want {nproc}"
    assert len(jax.devices()) == 2 * nproc, jax.devices()
    assert len(jax.local_devices()) == 2

    g = pod_grid(pr=2, pc=2)

    # global_put roundtrip: every process supplies identical host data
    x = np.arange(g.nprocs * 4, dtype=np.float32)
    arr = global_put(x, g.vec_sharding())
    import jax.numpy as jnp

    s = float(jnp.sum(arr))
    assert s == float(x.sum()), (s, x.sum())

    # one SUMMA SpGEMM across the process boundary
    from combblas_tpu import SpCOO
    from combblas_tpu.parallel.dist import DistSpMat
    from combblas_tpu.parallel.summa import summa_bounds, summa_spgemm

    rng = np.random.default_rng(5)
    d = (rng.random((12, 12)) < 0.4).astype(np.float32)
    A = DistSpMat.from_local(SpCOO.from_dense(d), g)
    fc, oc = summa_bounds(A, A)
    c = summa_spgemm(A, A, flops_cap=fc, out_capacity=oc)
    nnz = int(jnp.sum(c.nnz))
    want = int((d @ d != 0).sum())
    assert nnz == want, (nnz, want)
    # value check via a replicated reduction (to_dense would gather
    # non-addressable shards)
    tot = float(jnp.sum(jnp.where(jnp.isfinite(c.val), c.val, 0.0)))
    ref = float((d @ d).sum())
    assert abs(tot - ref) < 1e-3 * max(abs(ref), 1.0), (tot, ref)

    # the VECTOR layer across the process boundary: a distributed BFS
    # (fan-out all_gather + fan-in reduce-scatter per level) on a known
    # path graph, and a mesh sample sort
    from combblas_tpu.models.bfs import bfs_dist
    from combblas_tpu.parallel.vector import dist_sort_auto

    n = 12
    path = np.zeros((n, n), np.float32)
    for i in range(n - 1):
        path[i, i + 1] = 1.0
        path[i + 1, i] = 1.0
    P = DistSpMat.from_local(SpCOO.from_dense(path), g)
    parents, levels = bfs_dist(P, 0)
    # non-addressable shards cannot be device_get across controllers —
    # assert via replicated scalar reductions instead
    stats = jax.jit(lambda l: (jnp.max(l), jnp.sum(jnp.where(l >= 0, l, 0)),
                               jnp.sum((l >= 0).astype(jnp.int32))))(levels)
    depth, lsum, visited = (int(v) for v in stats)
    assert depth == n - 1 and visited == n, (depth, visited)
    assert lsum == n * (n - 1) // 2, lsum

    rng2 = np.random.default_rng(9)
    keys = rng2.permutation(16).astype(np.int32)
    arr2 = global_put(keys, g.vec_sharding())
    sk = dist_sort_auto(arr2, g)
    mis = int(jax.jit(
        lambda v: jnp.sum(jnp.abs(
            v - jnp.arange(v.shape[0], dtype=v.dtype))))(sk))
    assert mis == 0, mis

    if is_coordinator():
        print(f"MULTIHOST_OK nnz={nnz} sum={tot} bfs_depth={depth} "
              f"sorted_ok=1", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
