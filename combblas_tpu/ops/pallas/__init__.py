"""Pallas-TPU kernels for the hot local ops.

Design note (why there are fewer Pallas kernels here than one might expect):
the local workloads of a combinatorial-BLAS library are *hypersparse
streaming* ops — gathers + segment reductions + sorts over nnz-sized arrays.
XLA lowers the jnp formulations of these to near-roofline VPU code already
(measured in bench.py), and the MXU is only exploitable when a dense (block)
structure exists, which power-law graph blocks do not have.  Pallas is used
where manual control wins: the VMEM-resident SpMM panel kernel
(spmm_kernel.py), and planned: double-buffered expansion for ESC SpGEMM and
async remote-copy SUMMA panel pipelines (the RMA variants of
``ParFriendsExt.h``)."""
