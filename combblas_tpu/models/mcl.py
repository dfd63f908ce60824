"""MCL / HipMCL — Markov clustering via the expand–prune–inflate loop.

TPU-native counterpart of ``Applications/MCL.cpp`` (``HipMCL`` at ``:515``:
``while (chaos > EPS)`` of memory-efficient SpGEMM expansion ``:574``, column
pruning ``MCLPruneRecoverySelect`` ``ParFriends.h:186``, ``Inflate`` ``:447``,
``MakeColStochastic`` ``:390``, ``Chaos`` ``:408``; cluster extraction
``Interpret`` ``:373`` via connected components).

The loop runs on the host (capacities change between iterations — the same
reason the reference re-estimates phases per iteration); each stage is a jitted
kernel.  Pruning keeps the reference's semantics: entries below ``cutoff`` are
dropped, then if a column still has more than ``select`` entries only its
``select`` largest survive (recovery of columns pruned too hard uses
``recover_num``/``recover_pct`` analogously).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from combblas_tpu.ops.coo import SpCOO, merge
from combblas_tpu.ops.ewise import apply_values, dim_apply, prune, prune_column
from combblas_tpu.ops.kselect import select_top_k_per_col
from combblas_tpu.ops.reduce import reduce_dim
from combblas_tpu.ops.spgemm import spgemm_auto
from combblas_tpu.models.cc import count_components, fastsv_local
from combblas_tpu.semiring import PLUS_TIMES, Semiring

__all__ = [
    "MCLParams",
    "mcl_local",
    "mcl_dist",
    "make_col_stochastic",
    "chaos",
]


@dataclasses.dataclass
class MCLParams:
    """Mirrors HipMCL's runtime parameters (``MCL.cpp:233-371`` ProcessParam)."""

    inflation: float = 2.0
    cutoff: float = 1.0e-4  # prunelimit base
    select: int = 1100  # -select
    recover_num: int = 1400  # -recover_num
    recover_pct: float = 0.9  # -recover_pct
    eps: float = 1.0e-3  # chaos convergence EPS
    max_iters: int = 100
    add_self_loops: bool = True


def make_col_stochastic(a: SpCOO) -> SpCOO:
    """Normalize columns to sum 1 (``MakeColStochastic``, ``MCL.cpp:390`` —
    Reduce(Column,+) -> Apply(safemultinv) -> DimApply)."""
    colsum = reduce_dim(a, "col")
    inv = jnp.where(colsum > 0, 1.0 / colsum, 0.0)  # safemultinv (Operations.h:103)
    return dim_apply(a, inv, "col")


def chaos(a: SpCOO) -> jax.Array:
    """Convergence metric (``Chaos``, ``MCL.cpp:408``): max over columns of
    (column max - column 2-norm²), scaled by column nnz=... reference uses
    colmax - sum(sq)/1 — we match: max_j (max_i A_ij - Σ_i A_ij²)."""
    from combblas_tpu.semiring import MAX_FIRST

    colmax = reduce_dim(a, "col", MAX_FIRST)
    colmax = jnp.where(jnp.isfinite(colmax), colmax, 0.0)
    colss = reduce_dim(a, "col", premap=_square)
    return jnp.max(colmax - colss)


def _square(v):
    return v * v


def _inflate(a: SpCOO, power: float) -> SpCOO:
    val = jnp.where(a.mask(), jnp.power(jnp.abs(a.val), power), 0.0)
    return dataclasses.replace(a, val=val)


def _mcl_prune(a: SpCOO, p: MCLParams, out_capacity: int) -> SpCOO:
    """Threshold + select + recovery (``MCLPruneRecoverySelect``,
    ``ParFriends.h:186``)."""
    from combblas_tpu.ops.reduce import nnz_per

    # 1. adaptive threshold: cutoff scaled by column average (reference's
    #    prunelimit uses avg*cutoff heuristics; keep the flat cutoff plus
    #    top-select guard, which is what dominates in practice).
    pruned = prune(a, lambda v: jnp.abs(v) < p.cutoff, out_capacity=out_capacity)
    # 2. columns still over 'select' keep only their largest 'select' entries.
    pruned = select_top_k_per_col(pruned, p.select, out_capacity=out_capacity)
    # 3. recovery: columns whose nnz fell below recover_pct of recover_num
    #    get entries back from the unpruned matrix (top recover_num).
    kept = nnz_per(pruned, "col")
    need_recover = kept < jnp.int32(p.recover_pct * min(p.recover_num, p.select))
    recovered = select_top_k_per_col(
        a, jnp.where(need_recover, p.recover_num, 0), out_capacity=out_capacity
    )
    # recovered columns come wholly from `recovered`, the rest from `pruned`,
    # so the merge never sees duplicate entries.
    both = merge(
        _mask_cols(pruned, ~need_recover),
        _mask_cols(recovered, need_recover),
        PLUS_TIMES,
        out_capacity=out_capacity,
    )
    return both


def _mask_cols(a: SpCOO, colmask: jax.Array) -> SpCOO:
    from combblas_tpu.ops.ewise import _compact

    n = a.shape[1]
    keep = colmask[jnp.minimum(a.col, n - 1)]
    return _compact(a, keep)


def mcl_local(
    a: SpCOO,
    params: Optional[MCLParams] = None,
    verbose: bool = False,
):
    """Run MCL on a local matrix; returns (cluster_labels, n_iterations).

    Clusters are the connected components of the converged matrix's structure
    (``Interpret``, ``MCL.cpp:373``).
    """
    p = params or MCLParams()
    n = a.shape[1]
    if p.add_self_loops:
        eye = SpCOO.from_dense(np.eye(n, dtype=np.float32))
        a = merge(a, eye, PLUS_TIMES)  # AdjustLoops (MCL.cpp:464)
    a = make_col_stochastic(a)
    cap = max(a.capacity, 1 << int(np.ceil(np.log2(max(min(p.select * n, n * n), 8)))))
    it = 0
    for it in range(1, p.max_iters + 1):
        a2 = spgemm_auto(a, a, out_capacity=None)  # expansion
        a2 = _mcl_prune(a2, p, min(cap, a2.capacity))
        a2 = _inflate(a2, p.inflation)  # inflation
        a2 = make_col_stochastic(a2)
        ch = float(chaos(a2))
        a = a2
        if verbose:
            print(f"mcl iter {it}: chaos={ch:.5f} nnz={int(a.nnz)}")
        if ch < p.eps:
            break
    # Interpret: clusters = weakly-connected components of final structure.
    sym = merge(a, a.transpose(), PLUS_TIMES)
    labels = fastsv_local(sym)
    return labels, it


def mcl_dist(a, params: Optional[MCLParams] = None, phases: int = 1,
             verbose: bool = False):
    """Distributed HipMCL (``MCL.cpp:515`` with ``MemEfficientSpGEMM`` at
    ``:574``): the expansion runs as (optionally phased) SUMMA on the 2D mesh,
    pruning/normalization as distributed column ops, convergence via the
    distributed chaos metric, and Interpret as distributed FastSV.

    ``a``: DistSpMat on a square grid.  Returns (labels, iterations)."""
    import jax.numpy as jnp

    from combblas_tpu.models.cc import fastsv_dist
    from combblas_tpu.parallel.dist import DistSpMat
    from combblas_tpu.parallel.elementwise import (
        dist_add,
        dist_apply,
        dist_dim_apply,
        dist_kselect_col,
        dist_prune,
        dist_prune_column,
        dist_reduce,
        dist_transpose,
    )
    from combblas_tpu.parallel.memefficient import mem_efficient_spgemm
    from combblas_tpu.semiring import MAX_FIRST

    p = params or MCLParams()

    def col_stochastic(m: DistSpMat) -> DistSpMat:
        colsum = dist_reduce(m, "col")
        inv = jnp.where(colsum > 0, 1.0 / colsum, 0.0)
        return dist_dim_apply(m, inv, "col")

    def dist_chaos(m: DistSpMat):
        cmax = dist_reduce(m, "col", MAX_FIRST)
        cmax = jnp.where(jnp.isfinite(cmax), cmax, 0.0)
        css = dist_reduce(m, "col", premap=_square)
        return jnp.max(cmax - css)

    def prune_hook(c: DistSpMat) -> DistSpMat:
        c = dist_prune(c, _below_cutoff(p.cutoff))
        th = dist_kselect_col(c, p.select)
        # keep entries >= per-column k-th largest (select step); -inf keeps all
        return dist_prune_column(c, th, _below_thresh)

    a = col_stochastic(a)
    it = 0
    for it in range(1, p.max_iters + 1):
        a2 = mem_efficient_spgemm(a, a, phases=phases, phase_hook=None)
        a2 = prune_hook(a2)
        a2 = dist_apply(a2, _pow_closure(p.inflation))
        a2 = col_stochastic(a2)
        ch = float(dist_chaos(a2))
        a = a2
        if verbose:
            print(f"mcl_dist iter {it}: chaos={ch:.5f} "
                  f"nnz={int(a.total_nnz())}")
        if ch < p.eps:
            break
    sym = dist_add(a, dist_transpose(a))
    labels = fastsv_dist(sym)
    return labels, it


def _below_cutoff(cutoff: float):
    def f(v):
        return jnp.abs(v) < cutoff

    return f


def _below_thresh(v, t):
    return v < t


def _pow_closure(power: float):
    def f(v):
        return jnp.power(jnp.abs(v), power)

    return f
