"""Deterministic reference-workload inputs for the bench.

The headline workload is the matrix the REFERENCE's own generator produces
(SSCA initiator, edgefactor 8, deterministic seeds — the exact
``DistEdgeList::GenGraph500Data`` single-rank path; see
``bench_ref/ref_workload.cpp`` and the committed provenance log
``bench_logs/ref_workload_provenance.log``).  Matrices are dumped once by
the C++ harness into a host cache directory and loaded as SpCOO; the dump
is bit-deterministic, so the cache is just a time saver.
"""

from __future__ import annotations

import os
import subprocess

import numpy as np

_CACHE = os.environ.get("COMBBLAS_REF_INPUT_DIR", "/tmp/combblas_ref_inputs")
_HERE = os.path.dirname(os.path.abspath(__file__))


def ensure_ref_input(scale: int, which: str = "A", edgefactor: int = 8):
    """Return the path of the dumped reference-generator matrix, building
    the harness and generating the dump if needed."""
    assert which in ("A", "B")
    os.makedirs(_CACHE, exist_ok=True)
    path = os.path.join(_CACHE, f"ref_s{scale}_{which}.bin")
    if os.path.exists(path):
        return path
    binary = os.path.join(_HERE, "ref_workload")
    if not os.path.exists(binary):
        subprocess.run(["sh", os.path.join(_HERE, "build.sh")], check=True,
                       capture_output=True)
    subprocess.run(
        [binary, str(scale), str(edgefactor), "--dump",
         os.path.join(_CACHE, f"ref_s{scale}")],
        check=True, capture_output=True)
    assert os.path.exists(path), path
    return path


def load_ref_coo(scale: int, which: str = "A", edgefactor: int = 8):
    """Load a dumped reference-generator matrix as a device SpCOO."""
    from combblas_tpu.ops.coo import SpCOO

    path = ensure_ref_input(scale, which, edgefactor)
    raw = np.fromfile(path, np.int64)
    m, n, nnz = raw[:3]
    rec = raw[3:].reshape(int(nnz), 3)
    return SpCOO.from_arrays(
        rec[:, 0].astype(np.int32), rec[:, 1].astype(np.int32),
        rec[:, 2].view(np.float64).astype(np.float32),
        (int(m), int(n)), sum_duplicates=False)
