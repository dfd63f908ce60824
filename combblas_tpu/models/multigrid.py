"""Algebraic-multigrid restriction: MIS-2 coarsening and Galerkin products.

TPU-native counterpart of ``3DSpGEMM/RestrictionOp.h`` (MIS-2 at ``:118``,
restriction triple product R·A·Rᵀ at ``:197``) and the Galerkin test drivers
(``ReleaseTests/Galerkin.cpp``, ``GalerkinNew.cpp:105-112`` — S·A·Sᵀ with
permutations).

MIS-2 is Luby over the distance-2 neighborhood: a vertex wins when its random
priority beats every vertex within two hops — two chained (max, select2nd)
SpMV passes per round.  The restriction matrix maps every vertex to its
nearest MIS-2 coarse vertex; the coarse operator is two semiring SpGEMMs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from combblas_tpu.ops.coo import SpCOO
from combblas_tpu.ops.spgemm import spgemm_auto
from combblas_tpu.ops.spmv import spmv
from combblas_tpu.semiring import MAX_SECOND, PLUS_TIMES

__all__ = ["mis2", "restriction_op", "galerkin"]


@jax.jit
def mis2(a: SpCOO, key: jax.Array) -> jax.Array:
    """Maximal independent set in the distance-2 graph (``RestrictionOp.h:118``)."""
    n = a.shape[0]

    def two_hop_max(x):
        h1 = spmv(a, x, MAX_SECOND)
        h1 = jnp.maximum(jnp.where(jnp.isfinite(h1), h1, 0.0), x)
        h2 = spmv(a, h1, MAX_SECOND)
        return jnp.maximum(jnp.where(jnp.isfinite(h2), h2, 0.0), h1)

    def cond(c):
        _, live, _ = c
        return jnp.any(live)

    def body(c):
        in_set, live, k = c
        k, sub = jax.random.split(k)
        pri = jnp.where(live, jax.random.uniform(sub, (n,)) + 1.0, 0.0)
        nbr2 = two_hop_max(pri)
        winners = live & (pri >= nbr2) & (pri > 0)
        # winners remove their distance-2 neighborhood from the live set
        w = winners.astype(jnp.float32)
        h1 = spmv(a, w, MAX_SECOND)
        h1 = jnp.maximum(jnp.where(jnp.isfinite(h1), h1, 0.0), w)
        h2 = spmv(a, h1, MAX_SECOND)
        hit = (jnp.maximum(jnp.where(jnp.isfinite(h2), h2, 0.0), h1)) > 0
        return in_set | winners, live & ~hit, k

    in_set, _, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((n,), jnp.bool_), jnp.ones((n,), jnp.bool_), key)
    )
    return in_set


def restriction_op(a: SpCOO, key: jax.Array) -> SpCOO:
    """Build the (ncoarse, n) restriction matrix: coarse vertices are the
    MIS-2 set; every fine vertex attaches to one adjacent coarse vertex (or
    itself).  (``RestrictionOp.h:197`` construction.)"""
    n = a.shape[0]
    in_set = np.asarray(mis2(a, key))
    coarse = np.nonzero(in_set)[0]
    cid = np.full(n, -1, np.int64)
    cid[coarse] = np.arange(coarse.size)
    # nearest coarse neighbor: one hop, else two hops, else self-coarse
    nnz = int(a.nnz)
    r = np.asarray(a.row)[:nnz]
    c = np.asarray(a.col)[:nnz]
    attach = np.full(n, -1, np.int64)
    attach[coarse] = coarse
    # one-hop attachment (min coarse neighbor id for determinism)
    for u, v in zip(r, c):
        if attach[u] < 0 and in_set[v]:
            attach[u] = v if attach[u] < 0 else min(attach[u], v)
        if attach[v] < 0 and in_set[u]:
            attach[v] = u if attach[v] < 0 else min(attach[v], u)
    # two-hop: attach to the attachment of any attached neighbor
    for _ in range(2):
        for u, v in zip(r, c):
            if attach[u] < 0 and attach[v] >= 0:
                attach[u] = attach[v]
            if attach[v] < 0 and attach[u] >= 0:
                attach[v] = attach[u]
    # isolated leftovers become their own coarse points
    left = np.nonzero(attach < 0)[0]
    if left.size:
        extra = np.arange(coarse.size, coarse.size + left.size)
        cid[left] = extra
        attach[left] = left
        coarse = np.concatenate([coarse, left])
    rows = cid[attach]
    return SpCOO.from_arrays(
        rows, np.arange(n), np.ones(n, np.float32), (coarse.size, n)
    )


def galerkin(r: SpCOO, a: SpCOO) -> SpCOO:
    """Coarse operator R·A·Rᵀ (``RestrictionOp.h:197``; test drivers
    ``ReleaseTests/GalerkinNew.cpp:105-112``)."""
    ra = spgemm_auto(r, a)
    return spgemm_auto(ra, r.transpose())
