"""Host-side CSR matrix (NumPy) for setup-time work.

The reference wraps ``faer::sparse::SparseRowMat`` (src/matrix/sparse.rs:22-47).
In the TPU design, CSR lives on the *host* only: it is the assembly and
symbolic-factorization format (ILU, AMG, coloring all walk CSR graphs),
while the *device* formats are ELL / stencils (core/linop.py). Conversion
``CSR -> ELL`` pads every row to the max row-nnz so the device kernel is
fully regular.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class CSRMatrix:
    """Compressed sparse row matrix on host (reference CsrMatrix, sparse.rs:22-47)."""

    def __init__(self, indptr, indices, data, shape: Tuple[int, int]):
        self.indptr = np.asarray(indptr, dtype=np.int64)
        self.indices = np.asarray(indices, dtype=np.int64)
        self.data = np.asarray(data)
        self.shape = tuple(shape)
        if len(self.indptr) != shape[0] + 1:
            raise ValueError("indptr length must be nrows + 1")

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_coo(cls, rows, cols, vals, shape) -> "CSRMatrix":
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals)
        # sort by flat key once (lexsort+unique cost ~2.5x more at 8M dof)
        if len(rows):
            key = rows * shape[1] + cols
            order = np.argsort(key, kind="stable")
            key = key[order]
            rows, cols, vals = rows[order], cols[order], vals[order]
            first = np.empty(len(key), dtype=bool)
            first[0] = True
            np.not_equal(key[1:], key[:-1], out=first[1:])
            if not first.all():  # sum duplicates (segment-reduce over runs)
                starts = np.flatnonzero(first)
                vals = np.add.reduceat(vals, starts)
                rows, cols = rows[starts], cols[starts]
        indptr = np.zeros(shape[0] + 1, dtype=np.int64)
        np.add.at(indptr, rows + 1, 1)
        np.cumsum(indptr, out=indptr)
        return cls(indptr, cols, vals, shape)

    @classmethod
    def from_dense(cls, a, tol: float = 0.0) -> "CSRMatrix":
        a = np.asarray(a)
        mask = np.abs(a) > tol
        rows, cols = np.nonzero(mask)
        return cls.from_coo(rows, cols, a[rows, cols], a.shape)

    # -- basic ops ----------------------------------------------------------
    @property
    def nnz(self) -> int:
        return len(self.data)

    def row(self, i: int):
        sl = slice(self.indptr[i], self.indptr[i + 1])
        return self.indices[sl], self.data[sl]

    def diag(self) -> np.ndarray:
        n = min(self.shape)
        d = np.zeros(n, dtype=self.data.dtype)
        rows_of_nnz = np.repeat(np.arange(self.shape[0]), self.row_nnz())
        hit = (rows_of_nnz == self.indices) & (rows_of_nnz < n)
        np.add.at(d, rows_of_nnz[hit], self.data[hit])
        return d

    def todense(self) -> np.ndarray:
        out = np.zeros(self.shape, dtype=self.data.dtype)
        for i in range(self.shape[0]):
            cols, vals = self.row(i)
            out[i, cols] += vals
        return out

    def spmv(self, x: np.ndarray) -> np.ndarray:
        y = np.zeros(self.shape[0], dtype=np.result_type(self.data, x))
        for i in range(self.shape[0]):
            cols, vals = self.row(i)
            y[i] = vals @ x[cols]
        return y

    def transpose(self) -> "CSRMatrix":
        rows = np.repeat(np.arange(self.shape[0]), np.diff(self.indptr))
        return CSRMatrix.from_coo(self.indices, rows, self.data, (self.shape[1], self.shape[0]))

    def submatrix(self, idx) -> "CSRMatrix":
        """Principal submatrix on an index set (SubmatrixExtract, traits.rs:50-53)."""
        idx = np.asarray(idx, dtype=np.int64)
        pos = -np.ones(self.shape[1], dtype=np.int64)
        pos[idx] = np.arange(len(idx))
        out_r, out_c, out_v = [], [], []
        for new_i, i in enumerate(idx):
            cols, vals = self.row(int(i))
            keep = pos[cols] >= 0
            out_r.append(np.full(keep.sum(), new_i))
            out_c.append(pos[cols[keep]])
            out_v.append(vals[keep])
        if out_r:
            rows = np.concatenate(out_r)
            cols = np.concatenate(out_c)
            vals = np.concatenate(out_v)
        else:  # pragma: no cover
            rows = cols = vals = np.array([])
        return CSRMatrix.from_coo(rows, cols, vals, (len(idx), len(idx)))

    def row_nnz(self) -> np.ndarray:
        return np.diff(self.indptr)

    # -- device conversion --------------------------------------------------
    def to_ell_arrays(self, k: Optional[int] = None, dtype=None):
        """Pad rows to width ``k`` (default: max row nnz). Returns (data, cols)."""
        widths = self.row_nnz()
        if k is None:
            k = int(widths.max()) if len(widths) else 1
        k = max(k, 1)
        n = self.shape[0]
        data = np.zeros((n, k), dtype=dtype or self.data.dtype)
        cols = np.zeros((n, k), dtype=np.int32)
        rows_of_nnz = np.repeat(np.arange(n), widths)
        pos_in_row = np.arange(self.nnz) - np.repeat(self.indptr[:-1], widths)
        keep = pos_in_row < k
        data[rows_of_nnz[keep], pos_in_row[keep]] = self.data[keep]
        cols[rows_of_nnz[keep], pos_in_row[keep]] = self.indices[keep]
        return data, cols

    def to_ell(self, k: Optional[int] = None, dtype=None):
        import jax.numpy as jnp

        from kryst_tpu.core.linop import ELLOperator

        data, cols = self.to_ell_arrays(k, dtype)
        return ELLOperator(jnp.asarray(data), jnp.asarray(cols), self.shape)

    def to_dense_operator(self, dtype=None):
        import jax.numpy as jnp

        from kryst_tpu.core.linop import DenseOperator

        return DenseOperator(jnp.asarray(self.todense(), dtype=dtype))

    def to_device_operator(self, dtype=None, grid=None):
        """Pick the device format: DIA when the diagonal structure allows
        (gather-free SpMV — the TPU fast path); otherwise dense for small
        operators (MXU matvec beats serial gathers whenever
        m*n/650GBps < nnz*7.7ns); then the cell layout (ops/cellspmv.py,
        one-hot MXU contractions) when its measured-rate cost model beats
        ELL — i.e. for wide-ELL-padding matrices, NOT low-k ones (a k=7
        expander row set runs faster as plain ELL); ELL is the format of
        last resort.

        DIA stores ndiag * n entries, so the dense-plane budget is capped
        (~256 MB f32) as well as the raw offset count — a 1M-row matrix
        with ~400 scattered diagonals would otherwise allocate GBs of
        mostly-zero planes.
        """
        from kryst_tpu.ops.dia import csr_to_dia

        try:
            budget = max(32, 64_000_000 // max(self.shape[0], 1))
            # grid= (structured row-major shape) enables exact
            # constant-stencil detection -> the zero-coefficient-traffic
            # matvec (ops/conststencil.py)
            return csr_to_dia(
                self, max_offsets=min(512, budget), dtype=dtype, grid=grid
            )
        except ValueError:
            pass
        import scipy.sparse as sp

        from kryst_tpu.matrix.formats import pick_unstructured

        return pick_unstructured(
            sp.csr_matrix(
                (self.data, self.indices, self.indptr), shape=self.shape
            ),
            dtype or self.data.dtype,
        )
