"""Labeled-graph I/O: string vertex names mapped to dense ids.

Counterpart of ``SpParMat::ReadGeneralizedTuples`` (``SpParMat.cpp``; used by
``CC.cpp:144`` for protein-name graphs, labels bounded by ``MAXVERTNAME=64``,
``SpDefs.h:68``) and the vector ``ParallelRead`` label path.  The reference
builds the label <-> id bijection with distributed sample sort; here label
interning is a host-side hash pass (I/O-bound preprocessing), and the
resulting matrix is device-resident as usual.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from combblas_tpu.ops.coo import SpCOO

__all__ = ["read_labeled_tuples", "write_labeled_tuples"]


def read_labeled_tuples(path: str, weighted: bool = True
                        ) -> Tuple[SpCOO, List[str]]:
    """Read whitespace-separated ``src dst [weight]`` lines with arbitrary
    string vertex names; returns (matrix, labels) with labels[i] the name of
    vertex id i (ids assigned in first-appearance order, like the
    reference's permutation-free mode)."""
    ids: Dict[str, int] = {}
    rows: List[int] = []
    cols: List[int] = []
    vals: List[float] = []

    def intern(name: str) -> int:
        i = ids.get(name)
        if i is None:
            i = len(ids)
            ids[name] = i
        return i

    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(("%", "#")):
                continue
            parts = line.split()
            if len(parts) < 2:
                continue
            rows.append(intern(parts[0]))
            cols.append(intern(parts[1]))
            vals.append(float(parts[2]) if weighted and len(parts) > 2 else 1.0)
    n = len(ids)
    labels = [""] * n
    for name, i in ids.items():
        labels[i] = name
    mat = SpCOO.from_arrays(
        np.asarray(rows), np.asarray(cols), np.asarray(vals, np.float32), (n, n)
    )
    return mat, labels


def write_labeled_tuples(path: str, a: SpCOO, labels: List[str]) -> None:
    nnz = int(a.nnz)
    r = np.asarray(a.row)[:nnz]
    c = np.asarray(a.col)[:nnz]
    v = np.asarray(a.val)[:nnz]
    with open(path, "w") as f:
        for i, j, w in zip(r, c, v):
            f.write(f"{labels[i]}\t{labels[j]}\t{w:.9g}\n")
