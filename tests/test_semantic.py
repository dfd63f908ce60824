"""TwitterGraph semantic-edge graph (TwitterEdge/FilteredBFS parity)."""
import numpy as np

from combblas_tpu.models.semantic import (
    TwitterGraph,
    is_follower,
    pack_twitter,
    tweet_within_interval,
    unpack_twitter,
)


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    f = rng.integers(0, 2, 100).astype(bool)
    c = rng.integers(0, 100, 100)
    t = rng.integers(0, 40000, 100)
    code = pack_twitter(f, c, t)
    import jax.numpy as jnp

    f2, c2, t2 = unpack_twitter(jnp.asarray(code))
    np.testing.assert_array_equal(np.asarray(f2), f)
    np.testing.assert_array_equal(np.asarray(c2), c)
    np.testing.assert_array_equal(np.asarray(t2), t)


def test_filtered_bfs_time_window():
    # path 0 -> 1 -> 2 -> 3; edge 1->2 retweeted at t=50, others at t=10
    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 3])
    follower = np.array([1, 1, 0])
    count = np.array([1, 1, 1])
    latest = np.array([10, 50, 10])
    g = TwitterGraph.build(src, dst, follower, count, latest, n=4)

    # window [0, 20]: edge 1->2 filtered out, BFS from 0 reaches {0, 1}
    parents, levels = g.bfs_within(0, 0, 20)
    lv = np.asarray(levels)
    assert lv[0] == 0 and lv[1] == 1 and lv[2] < 0 and lv[3] < 0

    # window [0, 60]: full path reachable
    parents, levels = g.bfs_within(0, 0, 60)
    lv = np.asarray(levels)
    assert list(lv[:4]) == [0, 1, 2, 3]

    # materialized subgraph drops exactly one edge
    sub = g.subgraph_within(0, 20)
    assert int(sub.nnz) == 2

    # follower decode on the packed matrix values
    fl = np.asarray(is_follower(g.mat.val))[: int(g.mat.nnz)]
    assert fl.sum() == 2
