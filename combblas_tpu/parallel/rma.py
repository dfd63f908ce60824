"""One-sided (RMA) ring SUMMA — the ``ParFriendsExt`` counterpart.

The reference's one-sided SUMMA variants (``Mult_AnXBn_ActiveTarget``
``ParFriendsExt.h:58``, ``PassiveTarget`` ``:291``) replace the per-stage
MPI_Bcast with MPI_Win RMA so panels move without a collective rendezvous.
The TPU-native analogue is Cannon's ring schedule over ICI: after an initial
skew (device (i, j) holds A(i, (i+j) mod p) and B((i+j) mod p, j)), every
stage multiplies the resident panels locally and then shifts A one hop left
along mesh axis 'c' and B one hop up along axis 'r' with Pallas
``make_async_remote_copy`` RDMA — point-to-point pushes over single ICI links
with semaphore rendezvous, no collective in the steady state (the guide's
ring-collective pattern).

This is the bandwidth-optimal SUMMA on a torus mesh: each stage moves each
block exactly one hop, total traffic = p-1 block-hops per operand (identical
to the broadcast variants), but with only neighbor synchronization — the TPU
shape of the RMA variants' "no global rendezvous" property.

Tested on the virtual CPU mesh in interpreter mode (remote DMAs emulated);
on a real TPU slice the same code compiles to ICI RDMA (interpret=False).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from combblas_tpu.ops.coo import compress_sorted
from combblas_tpu.ops.spgemm import expand_products
from combblas_tpu.parallel.dist import DistSpMat, block_dims
from combblas_tpu.semiring import PLUS_TIMES, Semiring

__all__ = ["summa_spgemm_rma"]

_SPEC = P("r", "c", None)
_NSPEC = P("r", "c")
_LANES = 128


def _ring_shift_kernel(rows: int, dtype, axis: str, collective_id: int):
    """One-hop ring push of a (rows, 128) buffer to the next device along
    ``axis`` (wrapping).  Returns the buffer received from the previous
    device."""

    def kernel(x_ref, o_ref, comm, send_sem, recv_sem):
        size = jax.lax.axis_size(axis)
        me = jax.lax.axis_index(axis)
        right = jax.lax.rem(me + 1, size)
        comm[0] = x_ref[:]
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm.at[0],
            dst_ref=comm.at[1],
            send_sem=send_sem,
            recv_sem=recv_sem,
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
        o_ref[:] = comm[1]

    def run(x2d, *, interpret: bool):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, _LANES), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, rows, _LANES), dtype),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=collective_id
            ),
            interpret=interpret,
        )(x2d)

    return run


def _shift_block(row, col, val, nnz, axis: str, cid: int, interpret: bool):
    """Ring-shift one sparse block (capacity-padded triples + nnz scalar).

    The nnz scalar rides lane 0 of an extra int32 row appended to the row-ids
    buffer — one RDMA per array, no separate scalar exchange (the reference
    moves its 'essentials' the same way, ``SpParHelper.cpp:583``).

    Under ``interpret=True`` (virtual CPU meshes) the Pallas interpreter only
    emulates remote DMAs on single-named-axis meshes, so the one-hop push
    falls back to the semantically identical ``lax.ppermute``; the RDMA
    kernel itself is covered by a dedicated single-axis interpreter test
    (tests/test_rma.py)."""
    if interpret:
        size = jax.lax.axis_size(axis)
        perm = [(s, (s + 1) % size) for s in range(size)]

        def sh(x):
            return jax.lax.ppermute(x, axis, perm)

        return sh(row), sh(col), sh(val), sh(nnz)
    cap = row.shape[0]
    rows = -(-cap // _LANES)
    pad = rows * _LANES - cap

    def pad2d(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad,), fill, x.dtype)]).reshape(rows, _LANES)

    meta = jnp.zeros((1, _LANES), jnp.int32).at[0, 0].set(nnz)
    ri = jnp.concatenate([pad2d(row, 0), meta], axis=0)
    ish = _ring_shift_kernel(rows + 1, jnp.int32, axis, cid)
    csh = _ring_shift_kernel(rows, jnp.int32, axis, cid + 1)
    vsh = _ring_shift_kernel(rows, val.dtype, axis, cid + 2)
    ri2 = ish(ri, interpret=False)
    c2 = csh(pad2d(col, 0), interpret=False)
    v2 = vsh(pad2d(val, 0), interpret=False)
    return (
        ri2[:rows].reshape(-1)[:cap],
        c2.reshape(-1)[:cap],
        v2.reshape(-1)[:cap],
        ri2[rows, 0],
    )


def _rma_local(
    ar, ac, av, an, br, bc, bv, bn,
    *, sr, stage_flops_cap, out_capacity, mb, nb, kb_a, kb_b, stages,
    interpret,
):
    ar_, ac_, av_ = ar.reshape(-1), ac.reshape(-1), av.reshape(-1)
    br_, bc_, bv_ = br.reshape(-1), bc.reshape(-1), bv.reshape(-1)
    an_, bn_ = an.reshape(()), bn.reshape(())
    cap_a = ar_.shape[0]

    acc_row = jnp.full((out_capacity,), mb, jnp.int32)
    acc_col = jnp.full((out_capacity,), nb, jnp.int32)
    acc_val = jnp.zeros((out_capacity,), av_.dtype)
    acc_nnz = jnp.asarray(0, jnp.int32)

    pa = (ar_, ac_, av_, an_)
    pb = (br_, bc_, bv_, bn_)

    # Python stage loop: remote-DMA kernels need distinct collective_ids per
    # rendezvous, and stage count == mesh axis size (static).
    for s in range(stages):
        par, pac, pav, pan = pa
        pbr, pbc, pbv, pbn = pb
        rp = jnp.searchsorted(
            pbr, jnp.arange(kb_b + 1, dtype=jnp.int32)).astype(jnp.int32)
        rp = jnp.minimum(rp, pbn)
        a_valid = jnp.arange(cap_a, dtype=jnp.int32) < pan
        i, j, v, total = expand_products(
            par, pac, pav, a_valid, pbc, pbv, rp[:-1], rp[1:],
            sr, stage_flops_cap, (mb, nb),
        )
        mrow = jnp.concatenate([acc_row, i])
        mcol = jnp.concatenate([acc_col, j])
        mval = jnp.concatenate([acc_val, v])
        mrow, mcol, mval = jax.lax.sort((mrow, mcol, mval), num_keys=2)
        merged = compress_sorted(
            mrow, mcol, mval, acc_nnz + total, (mb, nb), sr=sr,
            out_capacity=out_capacity,
        )
        acc_row, acc_col, acc_val, acc_nnz = (
            merged.row, merged.col, merged.val, merged.nnz)
        if s + 1 < stages:
            pa = _shift_block(par, pac, pav, pan, "c", 1 + 6 * s, interpret)
            pb = _shift_block(pbr, pbc, pbv, pbn, "r", 4 + 6 * s, interpret)

    return (
        acc_row.reshape(1, 1, -1),
        acc_col.reshape(1, 1, -1),
        acc_val.reshape(1, 1, -1),
        acc_nnz.reshape(1, 1),
    )


def _skew(x, grid, axis_of_shift: str):
    """Initial Cannon skew on the block grid: along 'c', device (i, j) takes
    the block from (i, (i+j) mod p); along 'r', from ((i+j) mod p, j).
    Expressed as a gather on the sharded global array (one-time relayout —
    XLA inserts the collective)."""
    p = grid.pr
    ii = jnp.arange(p, dtype=jnp.int32)[:, None]
    jj = jnp.arange(p, dtype=jnp.int32)[None, :]
    if axis_of_shift == "c":
        src = (ii + jj) % p
        return x[ii, src]
    src = (ii + jj) % p
    return x[src, jj]


@functools.partial(
    jax.jit,
    static_argnames=("sr", "stage_flops_cap", "out_capacity", "interpret"),
)
def summa_spgemm_rma(
    a: DistSpMat,
    b: DistSpMat,
    sr: Semiring = PLUS_TIMES,
    *,
    stage_flops_cap: int,
    out_capacity: int,
    interpret: bool = False,
) -> DistSpMat:
    """Cannon-schedule one-sided SUMMA (``ParFriendsExt.h:58,291`` parity).

    Per-stage panel movement is a single-hop Pallas RDMA push to the mesh
    neighbor instead of a broadcast.  ``interpret=True`` runs the remote
    copies under the Pallas interpreter (virtual CPU meshes)."""
    assert a.grid == b.grid and a.gshape[1] == b.gshape[0]
    grid = a.grid
    assert grid.pr == grid.pc, "ring SUMMA needs a square grid"
    mb, kb_a = block_dims(a.gshape, grid)
    kb_b, nb = block_dims(b.gshape, grid)
    ar = _skew(a.row, grid, "c")
    ac = _skew(a.col, grid, "c")
    av = _skew(a.val, grid, "c")
    an = _skew(a.nnz, grid, "c")
    br = _skew(b.row, grid, "r")
    bc = _skew(b.col, grid, "r")
    bv = _skew(b.val, grid, "r")
    bn = _skew(b.nnz, grid, "r")
    fn = functools.partial(
        _rma_local,
        sr=sr, stage_flops_cap=stage_flops_cap, out_capacity=out_capacity,
        mb=mb, nb=nb, kb_a=kb_a, kb_b=kb_b, stages=grid.pc,
        interpret=interpret,
    )
    crow, ccol, cval, cnnz = shard_map(
        fn,
        mesh=grid.mesh,
        in_specs=(_SPEC, _SPEC, _SPEC, _NSPEC) * 2,
        out_specs=(_SPEC, _SPEC, _SPEC, _NSPEC),
        check_vma=False,
    )(ar, ac, av, an, br, bc, bv, bn)
    return DistSpMat(row=crow, col=ccol, val=cval, nnz=cnnz,
                     gshape=(a.gshape[0], b.gshape[1]), grid=grid)
