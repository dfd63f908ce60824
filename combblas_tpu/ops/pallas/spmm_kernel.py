"""Pallas-TPU SpMM: sparse (m, n) × dense (n, d) with VMEM-resident operands.

Targets the distributed per-device regime (see ``parallel/dense.py:dist_spmm``)
where the local X panel (nb, d) and output block (mb, d) fit VMEM — the usual
case on a pod where nb = n/pc.  The kernel streams the nnz in row-sorted order
through a grid over nnz tiles; each tile accumulates rows into the output with
dynamic-slice loads of X rows (VPU) — gather+FMA at VMEM bandwidth, no HBM
round-trips between tiles, which is precisely what the fused jnp gather/
segment-sum path cannot guarantee once XLA spills intermediates.

Reference counterpart: the dense-output SpMM used by ``SpMMError``/
``Roofline`` (``Friends.h:64`` row-major accumulation).

Correctness-first v0: per-element accumulation inside a fori_loop.  The jnp
fallback (:func:`combblas_tpu.ops.spmv.spmm`) remains the default; use
``spmm_pallas`` explicitly or via ``spmm(..., use_pallas=True)`` once
benchmarked favorably for the shape at hand.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from combblas_tpu.ops.coo import SpCOO

__all__ = ["spmm_pallas"]


def _spmm_kernel(row_ref, col_ref, val_ref, nnz_ref, x_ref, out_ref):
    cap = row_ref.shape[0]
    nnz = nnz_ref[0]
    out_ref[:] = jnp.zeros_like(out_ref)

    def body(e, _):
        @pl.when(e < nnz)
        def _():
            r = row_ref[e]
            c = col_ref[e]
            v = val_ref[e]
            xrow = x_ref[pl.ds(c, 1), :]
            out_ref[pl.ds(r, 1), :] += v * xrow
        return _

    jax.lax.fori_loop(0, cap, lambda e, s: (body(e, s), s)[1], 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmm_pallas(a: SpCOO, x: jax.Array, interpret: bool = False) -> jax.Array:
    """y = A @ X (plus_times) via the Pallas kernel.  Requires row-sorted A
    (the SpCOO invariant); operands must fit VMEM (m*d + n*d + cap floats)."""
    m, n = a.shape
    d = x.shape[1]
    return pl.pallas_call(
        _spmm_kernel,
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a.row, a.col, a.val, a.nnz.reshape(1), x)
