"""Filtered (semantic-graph) traversals.

TPU-native counterpart of ``Applications/FilteredBFS.cpp:129`` /
``FilteredMIS.cpp:147`` and the ``SemanticGraph.h`` wrapper: graphs whose
edges carry attributes (``TwitterEdge.h:15`` — follower flag + retweet
timestamp) and whose algorithms traverse only edges passing a predicate.

The reference pushes the filter into the semiring multiply ("late filtering");
here the edge attribute lives in the value array and the filter is applied as
an edge mask fused into the traversal's gather pass — same asymptotics, one
extra VPU compare per edge, no materialized subgraph (use
:func:`materialize_filtered` for repeated queries with one predicate).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from combblas_tpu.ops.coo import SpCOO
from combblas_tpu.ops.ewise import _compact
from combblas_tpu.models.bfs import _BfsState, _advance, _init_state

__all__ = ["bfs_filtered", "materialize_filtered", "mis_filtered"]


def materialize_filtered(a: SpCOO, pred: Callable) -> SpCOO:
    """Materialize the subgraph of edges with pred(attribute) True."""
    return _compact(a, pred(a.val))


@jax.jit
def _bfs_filtered_run(a: SpCOO, edge_ok: jax.Array, root):
    n = a.shape[0]
    valid = a.mask() & edge_ok
    src = jnp.minimum(a.row, n - 1)
    dst = jnp.minimum(a.col, n - 1)

    def cond(s: _BfsState):
        return s.nfront > 0

    def body(s: _BfsState):
        active = valid & s.front_mask[src]
        cand = jnp.where(active, src + 1, 0)
        seg = jnp.where(active, dst, n)
        y = jax.ops.segment_max(cand, seg, num_segments=n)
        return _advance(s, y, y > 0, n)

    out = jax.lax.while_loop(cond, body, _init_state(n, root))
    return out.parents, out.levels


def bfs_filtered(a: SpCOO, root, pred: Callable):
    """BFS over edges passing pred(edge_value) — late filtering
    (``FilteredBFS.cpp`` semantics).  Returns (parents, levels)."""
    edge_ok = pred(a.val)
    return _bfs_filtered_run(a, edge_ok, root)


def mis_filtered(a: SpCOO, key: jax.Array, pred: Callable):
    """Luby MIS on the filtered subgraph (``FilteredMIS.cpp``)."""
    from combblas_tpu.models.mis import luby_mis

    return luby_mis(materialize_filtered(a, pred), key)
