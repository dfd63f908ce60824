"""Pallas-TPU SpMM: sparse (m, n) × dense (n, d) with VMEM-resident operands.

Targets shapes where the dense operand X (n, d) and output Y (m, d) fit VMEM
— the per-device regime of ``parallel/dense.py:dist_spmm`` (local panels on a
pod) and the bench's Roofline shapes.  The XLA gather+segment_sum formulation
(:func:`combblas_tpu.ops.spmv.spmm`) materializes the (nnz, d) product tensor
in HBM several times over and its 512-byte row gather runs at a small
fraction of HBM bandwidth (measured ~24 GB/s effective at scale 16, d=128).
This kernel keeps X and Y in VMEM for the whole pass and streams only the
COO triples from HBM:

- grid over nnz tiles; each tile's (row, col, val) ride SMEM as scalars;
- entries processed in groups of 8 (one sublane block): 8 dynamic-slice row
  loads of X -> (8, d) tile, scaled by the 8 vals;
- rows are sorted (the SpCOO invariant), so each group is segmented by row
  runs: a 3-step row-guarded prefix combine folds same-row products along
  sublanes, and only each run's LAST sublane accumulates into Y (one +=
  per distinct row — ~1 store per 8 entries on R-MAT degree profiles);
- the trailing open run carries across groups and tiles in a (1, d) VMEM
  scratch accumulator + SMEM carry row id, compress-kernel style.

Reference counterpart: the dense-output row-major accumulation of
``Friends.h:64`` (``dcsc_gespmv``) as used by ``Applications/SpMMError.cpp``
and ``ReleaseTests/Roofline.cpp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from combblas_tpu.ops.coo import SpCOO

__all__ = ["spmm_pallas"]

_T = 1024   # entries per grid tile
_G = 8      # entries per vector group (sublane block)


def _spmm_kernel(m: int, d: int, total_tiles: int):
    def kernel(row_ref, col_ref, val_ref, x_ref, out_ref,
               acc_ref, carry_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)
            carry_ref[0] = -1

        sub = jax.lax.broadcasted_iota(jnp.int32, (_G, d), 0)

        def group(g, _):
            base = g * _G
            rows = [row_ref[base + i] for i in range(_G)]
            xg = jnp.concatenate(
                [x_ref[pl.ds(col_ref[base + i], 1), :] for i in range(_G)],
                axis=0)
            rvec = jnp.zeros((_G, d), jnp.int32)
            vvec = jnp.zeros((_G, d), jnp.float32)
            for i in range(_G):
                rvec = jnp.where(sub == i, rows[i], rvec)
                vvec = jnp.where(sub == i, val_ref[base + i], vvec)
            prod = jnp.where(rvec < m, vvec * xg, 0.0)
            # row-guarded inclusive prefix sum along sublanes; rows are
            # monotone, so a simple equality guard cannot bridge runs
            p = prod
            for sh in (1, 2, 4):
                ok = (sub >= sh) & (pltpu.roll(rvec, sh, 0) == rvec)
                p = p + jnp.where(ok, pltpu.roll(p, sh, 0), 0.0)

            # carried open run: flush if this group starts a different row
            cr = carry_ref[0]

            @pl.when((cr >= 0) & (cr != rows[0]))
            def _():
                out_ref[pl.ds(cr, 1), :] += acc_ref[:]
                acc_ref[:] = jnp.zeros_like(acc_ref)
                carry_ref[0] = -1

            # completed runs -> Y (acc is nonzero only for the first run,
            # and then only when that run continues the carried row)
            for i in range(_G - 1):
                ri = rows[i]

                @pl.when((ri < m) & (ri != rows[i + 1]))
                def _():
                    out_ref[pl.ds(ri, 1), :] += p[i:i + 1, :] + acc_ref[:]
                    acc_ref[:] = jnp.zeros_like(acc_ref)
                    carry_ref[0] = -1

            # trailing (open) run joins the carry
            rl = rows[_G - 1]

            @pl.when(rl < m)
            def _():
                acc_ref[:] += p[_G - 1:_G, :]
                carry_ref[0] = rl
            return 0

        jax.lax.fori_loop(0, _T // _G, group, 0)

        @pl.when(b == total_tiles - 1)
        def _():
            cr = carry_ref[0]

            @pl.when(cr >= 0)
            def _():
                out_ref[pl.ds(cr, 1), :] += acc_ref[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmm_pallas(a: SpCOO, x: jax.Array, interpret: bool = False) -> jax.Array:
    """y = A @ X (plus_times) via the VMEM-resident streaming kernel.
    Requires row-sorted A (the SpCOO invariant), d a multiple of 128, and
    (m + n) * d * 4 bytes within VMEM."""
    m, n = a.shape
    d = x.shape[1]
    if d % 128:  # lane-pad narrow X; the kernel wants full 128-lane rows
        dp = -(-d // 128) * 128
        xp = jnp.concatenate(
            [x, jnp.zeros((x.shape[0], dp - d), x.dtype)], axis=1)
        return spmm_pallas(a, xp, interpret=interpret)[:, :d]
    cap = a.capacity
    padded = -(-cap // _T) * _T
    pad = padded - cap
    # pads: row sentinel m (masked in-kernel), col 0, val 0
    row = jnp.concatenate([jnp.minimum(a.row, m),
                           jnp.full((pad,), m, jnp.int32)])
    col = jnp.concatenate([jnp.minimum(a.col, n - 1),
                           jnp.zeros((pad,), jnp.int32)])
    val = jnp.concatenate([
        jnp.where(a.mask(), a.val.astype(jnp.float32), 0.0),
        jnp.zeros((pad,), jnp.float32)])
    total_tiles = padded // _T
    out = pl.pallas_call(
        _spmm_kernel(m, d, total_tiles),
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.float32),
        grid=(total_tiles,),
        in_specs=[
            pl.BlockSpec((_T,), lambda b: (b,), memory_space=pltpu.SMEM),
            pl.BlockSpec((_T,), lambda b: (b,), memory_space=pltpu.SMEM),
            pl.BlockSpec((_T,), lambda b: (b,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # X and Y are deliberately VMEM-resident (the kernel's whole
            # point); the default scoped-vmem limit (16M) is far below the
            # v5e's 128M physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(row, col, val, x.astype(jnp.float32))
    return out.astype(x.dtype)
