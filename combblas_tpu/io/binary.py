"""Binary matrix/vector I/O.

Counterpart of the reference's binary persistence: ``ParallelBinaryWrite``
(``SpParMat.cpp:620``), ``ReadDistribute`` binary path and the format described
in ``CombBLASbinaryIO.docx``, plus vector ``ParallelWrite/ParallelRead``
(``FullyDistSpVec.cpp:1209,1310``).

Format (little-endian): magic b'CBTPU1\\0\\0', int64 m, n, nnz, dtype tag,
then nnz*(int32 row, int32 col) followed by nnz values.  Column-major ordering
is not required on disk; loading canonicalizes.  This is this library's native
format, not a byte-for-byte clone of the reference's (.docx-documented) one —
the reference's *capability* (fast exact binary round-trip of distributed
matrices and vectors) is what is reproduced.
"""

from __future__ import annotations

import struct

import numpy as np

from combblas_tpu.ops.coo import SpCOO
from combblas_tpu.ops.spvec import SpVec

__all__ = ["write_binary", "read_binary", "write_vec_binary", "read_vec_binary"]

_MAGIC = b"CBTPU1\x00\x00"
_DTYPES = {0: np.float32, 1: np.float64, 2: np.int32, 3: np.int64, 4: np.bool_}
_DTAGS = {np.dtype(v): k for k, v in _DTYPES.items()}


def write_binary(path: str, a: SpCOO) -> None:
    nnz = int(a.nnz)
    row = np.asarray(a.row)[:nnz]
    col = np.asarray(a.col)[:nnz]
    val = np.asarray(a.val)[:nnz]
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<qqqq", a.shape[0], a.shape[1], nnz,
                            _DTAGS[val.dtype]))
        f.write(row.astype("<i4").tobytes())
        f.write(col.astype("<i4").tobytes())
        f.write(val.tobytes())


def read_binary(path: str, capacity: int | None = None) -> SpCOO:
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise ValueError(f"bad magic in {path}")
        m, n, nnz, tag = struct.unpack("<qqqq", f.read(32))
        row = np.frombuffer(f.read(4 * nnz), "<i4")
        col = np.frombuffer(f.read(4 * nnz), "<i4")
        dt = np.dtype(_DTYPES[tag])
        val = np.frombuffer(f.read(dt.itemsize * nnz), dt)
    return SpCOO.from_arrays(row, col, val, (m, n), capacity=capacity,
                             sum_duplicates=False)


def write_vec_binary(path: str, v: SpVec) -> None:
    nnz = int(v.nnz)
    idx = np.asarray(v.idx)[:nnz]
    val = np.asarray(v.val)[:nnz]
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<qqq", v.length, nnz, _DTAGS[val.dtype]))
        f.write(idx.astype("<i4").tobytes())
        f.write(val.tobytes())


def read_vec_binary(path: str, capacity: int | None = None) -> SpVec:
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise ValueError(f"bad magic in {path}")
        length, nnz, tag = struct.unpack("<qqq", f.read(24))
        idx = np.frombuffer(f.read(4 * nnz), "<i4")
        dt = np.dtype(_DTYPES[tag])
        val = np.frombuffer(f.read(dt.itemsize * nnz), dt)
    return SpVec.from_arrays(idx, val, length, capacity=capacity)
