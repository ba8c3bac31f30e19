"""MatrixMarket / SuiteSparse loading (BASELINE config 3).

The BASELINE names real SuiteSparse matrices (bcsstk*, thermal*,
atmosmodd) for config 3. This environment has no network egress, so the
loader is fetch-or-skip: it reads any ``.mtx``/``.mtx.gz`` already on
disk (``KRYST_TPU_SUITESPARSE_DIR``, default ``/root/repo/data``) and
raises a descriptive ``FileNotFoundError`` otherwise — bench.py then
falls back to the gallery proxies and says so.

Reference parity note: the reference has no matrix IO at all (its
``CsrMatrix::from_csr`` takes raw arrays, src/matrix/sparse.rs:22-47);
this module is the standard-format entry those arrays would come from.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from kryst_tpu.matrix.csr import CSRMatrix

_ENV = "KRYST_TPU_SUITESPARSE_DIR"
_DEFAULT_DIR = "/root/repo/data"


def data_dir() -> str:
    return os.environ.get(_ENV, _DEFAULT_DIR)


def load_matrix_market(path: str, dtype=np.float64) -> CSRMatrix:
    """Read a MatrixMarket file into the host CSR assembly format.

    Handles coordinate and array formats, real/integer fields, and the
    symmetric/skew-symmetric storage conventions (scipy's ``mmread``
    expands the stored triangle). Pattern matrices get unit values.
    """
    import scipy.io as sio
    import scipy.sparse as sp

    M = sio.mmread(path)
    if not sp.issparse(M):
        M = sp.csr_matrix(M)
    C = M.tocsr()
    C.sum_duplicates()
    C.sort_indices()
    return CSRMatrix(
        C.indptr, C.indices, C.data.astype(dtype, copy=False), C.shape
    )


def suitesparse_path(name: str, directory: Optional[str] = None) -> str:
    """Locate ``<name>.mtx[.gz]`` under the data directory (flat or in a
    ``<name>/`` subdirectory, the layout of SuiteSparse tarballs)."""
    d = directory or data_dir()
    candidates = [
        os.path.join(d, f"{name}.mtx"),
        os.path.join(d, f"{name}.mtx.gz"),
        os.path.join(d, name, f"{name}.mtx"),
        os.path.join(d, name, f"{name}.mtx.gz"),
    ]
    for c in candidates:
        if os.path.exists(c):
            return c
    raise FileNotFoundError(
        f"SuiteSparse matrix {name!r} not found under {d!r} "
        f"(tried {', '.join(os.path.basename(c) for c in candidates[:2])} "
        f"and {name}/ subdir). Download it from "
        f"https://sparse.tamu.edu (e.g. the MM tarball of {name}) into "
        f"that directory, or point {_ENV} at an existing collection."
    )


def load_suitesparse(name: str, directory: Optional[str] = None,
                     dtype=np.float64) -> CSRMatrix:
    """Fetch-or-skip SuiteSparse entry point: load ``name`` if a local
    copy exists, else raise ``FileNotFoundError`` (callers treat that as
    'skip — no data mount')."""
    return load_matrix_market(suitesparse_path(name, directory), dtype=dtype)


def available_suitesparse(names: List[str],
                          directory: Optional[str] = None) -> List[str]:
    """Subset of ``names`` present in the local data directory."""
    out = []
    for n in names:
        try:
            suitesparse_path(n, directory)
        except FileNotFoundError:
            continue
        out.append(n)
    return out
