"""Level-scheduled sparse triangular solves on device.

The hard TPU kernel behind ILU/SOR/Gauss-Seidel (SURVEY §7 "hard parts"):
a sparse triangular solve is inherently sequential row-to-row, but rows
grouped into dependency *levels* (pc/coloring.py) are mutually independent.
The solve becomes a ``lax.scan`` over levels; each step is one vectorized
gather → multiply-accumulate → scatter over a padded row set:

    x[rows] = (b[rows] - sum_k data[rows, k] * x[cols[rows, k]]) / diag[rows]

Replaces the reference's sequential substitution loops
(src/preconditioner/ilu.rs:105-122, ilup.rs:138-167, sor.rs:124-170) with
a data-parallel schedule. Exact same arithmetic, different execution order
within a level (sums are reassociated) — bitwise-identical in exact
arithmetic.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import Array, lax
from jax.tree_util import register_dataclass

from kryst_tpu.matrix.csr import CSRMatrix
from kryst_tpu.pc.coloring import (
    level_schedule_lower,
    level_schedule_upper,
    pad_levels,
)


@dataclasses.dataclass(frozen=True)
class TriangularFactor:
    """One triangular factor in ELL form plus its level schedule.

    ``data``/``cols``: strictly-triangular off-diagonal entries per row,
    padded with zeros (cols padded with the row's own index so the gathered
    x value is multiplied by 0.0 — always in-bounds).
    ``diag``: diagonal entries (set to 1.0 for unit-diagonal factors).
    ``levels``: (nlev, w) int32 row sets, -1 padded.
    """

    data: Array
    cols: Array
    diag: Array
    levels: Array
    n: int = dataclasses.field(metadata=dict(static=True))

    def solve(self, b: Array) -> Array:
        """Solve (D + T) x = b where T is the strict triangle."""
        x0 = jnp.zeros_like(b)

        def step(x, rows):
            valid = rows >= 0
            r = jnp.where(valid, rows, 0)
            acc = (self.data[r] * x[self.cols[r]]).sum(axis=1)
            xi = (b[r] - acc) / self.diag[r]
            # padded lanes scatter out of bounds and are dropped — they must
            # not alias row 0 (a duplicate scatter would overwrite it)
            r_scatter = jnp.where(valid, rows, self.n)
            return x.at[r_scatter].set(xi, mode="drop"), None

        x, _ = lax.scan(step, x0, self.levels)
        return x


register_dataclass(
    TriangularFactor, data_fields=["data", "cols", "diag", "levels"], meta_fields=["n"]
)


def _factor_from_csr(
    A: CSRMatrix, lower: bool, unit_diag: bool, diag, dtype
) -> TriangularFactor:
    """Vectorized builder shared by lower/upper (no Python row loop —
    the loop dominated exact-ILU setup once the factorization itself moved
    to the native C++ kernels)."""
    n = A.shape[0]
    dtype = dtype or A.data.dtype
    rows_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
    strict = (A.indices < rows_of) if lower else (A.indices > rows_of)
    s_rows = rows_of[strict]
    s_cols = A.indices[strict]
    s_vals = A.data[strict]
    widths = np.bincount(s_rows, minlength=n)
    k = max(int(widths.max()) if n else 0, 1)
    data = np.zeros((n, k), dtype=dtype)
    cols = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, k))
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(widths, out=starts[1:])
    pos = np.arange(len(s_rows)) - starts[:-1][s_rows]
    data[s_rows, pos] = s_vals
    cols[s_rows, pos] = s_cols
    diag_out = np.ones(n, dtype=dtype)
    if not unit_diag:
        dmask = A.indices == rows_of
        diag_out[rows_of[dmask]] = A.data[dmask].astype(dtype)
    if diag is not None:
        diag_out = np.asarray(diag, dtype=dtype)
    sched = level_schedule_lower if lower else level_schedule_upper
    levels = pad_levels(sched(starts, s_cols, n))
    return TriangularFactor(
        jnp.asarray(data), jnp.asarray(cols), jnp.asarray(diag_out),
        jnp.asarray(levels), n,
    )


def lower_factor_from_csr(
    L: CSRMatrix, unit_diag: bool = True, diag: Optional[np.ndarray] = None, dtype=None
) -> TriangularFactor:
    """Build a lower TriangularFactor from a CSR holding the lower triangle
    (strict or with diagonal)."""
    return _factor_from_csr(L, True, unit_diag, diag, dtype)


def upper_factor_from_csr(
    U: CSRMatrix, unit_diag: bool = False, diag: Optional[np.ndarray] = None, dtype=None
) -> TriangularFactor:
    """Build an upper TriangularFactor from a CSR holding the upper triangle."""
    return _factor_from_csr(U, False, unit_diag, diag, dtype)
