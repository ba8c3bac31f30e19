"""Linear operators as jit-able pytrees.

TPU-native replacement for the reference's trait layer
(``MatVec``/``MatTransVec``/``MatShape``/``MatrixGet``/``SubmatrixExtract``,
reference src/core/traits.rs:4-53). Instead of trait objects we register
small dataclasses as pytrees so operators can be passed straight through
``jax.jit`` / ``shard_map`` and traced.

Operator formats
----------------
- :class:`DenseOperator` — wraps a 2-D array; matvec on the MXU.
- :class:`ELLOperator` — general sparse format. ELLPACK: every row is
  padded to a fixed ``k`` nonzeros (pad entries have value 0, column 0), so
  the SpMV is a fully regular gather + multiply + row-sum. This replaces
  the reference's CSR-densifying ``spmv`` (src/matrix/sparse.rs:56-67)
  with a real sparse kernel — but note the measured TPU gather cliff
  (ops/spmv.py): on the hot path prefer ``DIAOperator`` (ops/dia.py),
  which ``api.solve`` selects automatically when the structure allows.
- :class:`StencilOperator2D` / :class:`StencilOperator3D` — constant/variable
  coefficient structured-grid operators whose matvec is a sum of shifted
  adds (no gather at all): the speed-of-light path for the Poisson /
  convection-diffusion benchmark configs.
- :class:`FunctionOperator` — matrix-free escape hatch (the analogue of the
  reference tests' hand-rolled ``DenseMat`` fake backend, cg.rs:296-307).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
from jax import Array
from jax.tree_util import register_dataclass


def _register(cls, data_fields, meta_fields):
    register_dataclass(cls, data_fields=data_fields, meta_fields=meta_fields)
    return cls


@dataclasses.dataclass(frozen=True)
class DenseOperator:
    """Dense matrix operator (reference ``DenseMatrix``, src/matrix/dense.rs:16-41)."""

    a: Array

    @property
    def shape(self) -> Tuple[int, int]:
        return self.a.shape

    @property
    def dtype(self):
        return self.a.dtype

    def matvec(self, x: Array) -> Array:
        return self.a @ x

    def rmatvec(self, x: Array) -> Array:
        # MatTransVec (traits.rs:10-13)
        return self.a.T @ x

    def diagonal(self) -> Array:
        return jnp.diagonal(self.a)

    def todense(self) -> Array:
        return self.a

    def submatrix(self, idx) -> "DenseOperator":
        """Principal submatrix gather (SubmatrixExtract, traits.rs:50-53)."""
        idx = jnp.asarray(idx)
        return DenseOperator(self.a[jnp.ix_(idx, idx)])


_register(DenseOperator, ["a"], [])


@dataclasses.dataclass(frozen=True)
class ELLOperator:
    """ELLPACK sparse operator: ``data[i, j]`` pairs with column ``cols[i, j]``.

    Padding entries carry value 0.0 and column 0 — safe because the product
    contributes nothing. ``shape`` is static metadata so jit caches per
    matrix size. Replaces the reference CSR wrapper whose spmv densifies
    (src/matrix/sparse.rs:56-67) with a regular-access TPU format.
    """

    data: Array  # (nrows, k) values
    cols: Array  # (nrows, k) int32 column indices
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def row_nnz(self) -> int:
        return self.data.shape[1]

    def matvec(self, x: Array) -> Array:
        from kryst_tpu.ops.spmv import ell_spmv

        return ell_spmv(self.data, self.cols, x)

    def rmatvec(self, x: Array) -> Array:
        # Transpose SpMV via scatter-add: y[cols[i,j]] += data[i,j] * x[i].
        n_out = self.shape[1]
        contrib = self.data * x[:, None]
        y = jnp.zeros((n_out,), dtype=jnp.result_type(self.data, x))
        return y.at[self.cols].add(contrib)

    def diagonal(self) -> Array:
        rows = jnp.arange(self.shape[0], dtype=self.cols.dtype)[:, None]
        return jnp.where(self.cols == rows, self.data, 0).sum(axis=1)

    def todense(self) -> Array:
        n, m = self.shape
        rows = jnp.arange(n, dtype=self.cols.dtype)[:, None]
        rows = jnp.broadcast_to(rows, self.cols.shape)
        dense = jnp.zeros((n, m), dtype=self.data.dtype)
        return dense.at[rows, self.cols].add(self.data)


_register(ELLOperator, ["data", "cols"], ["shape"])


@dataclasses.dataclass(frozen=True)
class StencilOperator2D:
    """5-point stencil on an ``nx × ny`` grid, row-major flattening.

    y[i,j] = c·x[i,j] + n·x[i-1,j] + s·x[i+1,j] + w·x[i,j-1] + e·x[i,j+1]

    Coefficients may be scalars (constant-coefficient) or full grids.
    The matvec is pure shifted adds — zero gathers, HBM-bandwidth bound —
    the idiomatic TPU form of the Poisson/convection-diffusion test
    operators (reference tests/preconditioner_integration.rs fixtures).
    """

    c: Array
    n: Array
    s: Array
    w: Array
    e: Array
    grid: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self) -> Tuple[int, int]:
        nx, ny = self.grid
        return (nx * ny, nx * ny)

    @property
    def dtype(self):
        return jnp.asarray(self.c).dtype

    # Both applies are built from slices of ONE zero-padded buffer so the
    # whole stencil is a single elementwise fusion. The earlier
    # ``y.at[interior].add(...)`` form lowered to a full-buffer
    # dynamic-update-slice per neighbor — 4-6 materialized passes; the 3-D
    # 1M-dof matvec measured 194 us (~15 us of traffic) inside compiled
    # loops (tools/tpu_r4_stage10.py). Out-of-grid neighbors read the zero
    # padding, which is exactly where the .at form never added.

    def _apply(self, x: Array, cn, cs, cw, ce) -> Array:
        nx, ny = self.grid
        g = x.reshape(nx, ny)
        gp = jnp.pad(g, 1)
        mid = slice(1, -1)

        # coefficient indexed at the DESTINATION row: the full (unshifted)
        # grid — scalar or array — multiplies each shifted-neighbor slice
        def term(c, sx, sy):
            return c * gp[sx, sy]

        y = (
            self.c * g
            + term(cn, slice(0, -2), mid)   # x[i-1, j]
            + term(cs, slice(2, None), mid)  # x[i+1, j]
            + term(cw, mid, slice(0, -2))   # x[i, j-1]
            + term(ce, mid, slice(2, None))  # x[i, j+1]
        )
        return y.reshape(-1)

    def matvec(self, x: Array) -> Array:
        return self._apply(x, self.n, self.s, self.w, self.e)

    def rmatvec(self, x: Array) -> Array:
        # Transpose of a shift is the opposite shift with coefficients
        # re-centred on the SOURCE row: coefficient and neighbor share the
        # same shifted slice (array coefficients are padded too — they are
        # loop-invariant, so XLA hoists the pad out of solver loops).
        nx, ny = self.grid
        g = x.reshape(nx, ny)
        gp = jnp.pad(g, 1)
        mid = slice(1, -1)

        def term(c, sx, sy):
            cs_ = c if jnp.ndim(c) == 0 else jnp.pad(c, 1)[sx, sy]
            return cs_ * gp[sx, sy]

        cn, cs, cw, ce = self.n, self.s, self.w, self.e
        # y_T[i] += A[j, i] x[j]: row j's north coeff contributes at j-1.
        y = (
            self.c * g
            + term(cn, slice(2, None), mid)   # cn[i+1] x[i+1]
            + term(cs, slice(0, -2), mid)     # cs[i-1] x[i-1]
            + term(cw, mid, slice(2, None))   # cw[., j+1] x[., j+1]
            + term(ce, mid, slice(0, -2))     # ce[., j-1] x[., j-1]
        )
        return y.reshape(-1)

    def diagonal(self) -> Array:
        nx, ny = self.grid
        return jnp.broadcast_to(self.c, (nx, ny)).reshape(-1)


_register(StencilOperator2D, ["c", "n", "s", "w", "e"], ["grid"])


@dataclasses.dataclass(frozen=True)
class StencilOperator3D:
    """7-point stencil on an ``nx × ny × nz`` grid (3-D Poisson benchmark)."""

    c: Array
    lo: Tuple[Array, Array, Array]  # coefficients for -1 shifts along each axis
    hi: Tuple[Array, Array, Array]  # coefficients for +1 shifts along each axis
    grid: Tuple[int, int, int] = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self) -> Tuple[int, int]:
        nx, ny, nz = self.grid
        n = nx * ny * nz
        return (n, n)

    @property
    def dtype(self):
        return jnp.asarray(self.c).dtype

    @staticmethod
    def _slices(axis):
        lo_sl = [slice(None)] * 3
        hi_sl = [slice(None)] * 3
        lo_sl[axis] = slice(1, None)
        hi_sl[axis] = slice(None, -1)
        return tuple(lo_sl), tuple(hi_sl)

    # Padded-slices form: one zero-padded buffer, every neighbor term a
    # VIEW, the whole 7-point apply a single elementwise fusion (the old
    # per-neighbor ``y.at[interior].add`` lowered to 6 full-buffer passes —
    # 194 us/matvec at 1M dof, measured; see StencilOperator2D note).

    def matvec(self, x: Array) -> Array:
        nx, ny, nz = self.grid
        g = x.reshape(nx, ny, nz)
        gp = jnp.pad(g, 1)
        mid = (slice(1, -1),) * 3
        y = self.c * g
        for axis in range(3):
            cl, ch = self.lo[axis], self.hi[axis]
            lo_sl = mid[:axis] + (slice(0, -2),) + mid[axis + 1:]
            hi_sl = mid[:axis] + (slice(2, None),) + mid[axis + 1:]
            # grid-valued coefficients index at the DESTINATION row,
            # mirroring StencilOperator2D
            y = y + cl * gp[lo_sl]  # x[.., i-1, ..] with coeff at row i
            y = y + ch * gp[hi_sl]  # x[.., i+1, ..]
        return y.reshape(-1)

    def rmatvec(self, x: Array) -> Array:
        nx, ny, nz = self.grid
        g = x.reshape(nx, ny, nz)
        gp = jnp.pad(g, 1)
        mid = (slice(1, -1),) * 3
        y = self.c * g

        def cpad(c, sl):
            # SOURCE-row coefficient: pad + shift alongside the data (the
            # pads of loop-invariant coefficient grids hoist out of jit
            # loops)
            return c if jnp.ndim(c) == 0 else jnp.pad(c, 1)[sl]

        for axis in range(3):
            cl, ch = self.lo[axis], self.hi[axis]
            lo_sl = mid[:axis] + (slice(0, -2),) + mid[axis + 1:]
            hi_sl = mid[:axis] + (slice(2, None),) + mid[axis + 1:]
            # transpose: row j's lo coefficient contributes at j-1
            y = y + cpad(cl, hi_sl) * gp[hi_sl]
            y = y + cpad(ch, lo_sl) * gp[lo_sl]
        return y.reshape(-1)

    def diagonal(self) -> Array:
        nx, ny, nz = self.grid
        return jnp.broadcast_to(self.c, (nx, ny, nz)).reshape(-1)


_register(StencilOperator3D, ["c", "lo", "hi"], ["grid"])


@dataclasses.dataclass(frozen=True)
class FunctionOperator:
    """Matrix-free operator from traceable closures (static metadata).

    The analogue of the per-file ``DenseMat`` fake backends in the reference
    tests (e.g. cg.rs:296-307): decouples solver logic from any storage
    format.
    """

    mv: Callable[[Array], Array] = dataclasses.field(metadata=dict(static=True))
    rmv: Optional[Callable[[Array], Array]] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    shape: Tuple[int, int] = dataclasses.field(
        default=(0, 0), metadata=dict(static=True)
    )

    def matvec(self, x: Array) -> Array:
        return self.mv(x)

    def rmatvec(self, x: Array) -> Array:
        if self.rmv is None:
            raise NotImplementedError("FunctionOperator has no rmatvec")
        return self.rmv(x)


_register(FunctionOperator, [], ["mv", "rmv", "shape"])


def as_operator(a, dtype=None):
    """Coerce an array / operator-like object to a LinearOperator.

    Host ``CSRMatrix`` assemblies are converted to the preferred device
    format (DIA when the diagonal structure allows, ELL otherwise) so
    every solver entry point accepts them, not just ``solve()``.

    ``dtype`` applies only to that host->device conversion (solvers pass
    the rhs dtype so an f64-assembled CSR with an f32 rhs does not
    produce a dtype-mismatched solver carry); existing device operators
    are returned as-is, never cast.
    """
    if hasattr(a, "to_device_operator"):  # host CSRMatrix (duck-typed)
        return a.to_device_operator(dtype=dtype)
    if hasattr(a, "matvec"):
        return a
    # raw dense arrays are also a host-side input: honor dtype so an
    # f64 ndarray with an f32 rhs doesn't mismatch the solver carry
    arr = jnp.asarray(a) if dtype is None else jnp.asarray(a, dtype=dtype)
    if arr.ndim != 2:
        raise ValueError(f"expected 2-D array, got shape {arr.shape}")
    return DenseOperator(arr)


def matvec(A, x: Array) -> Array:
    return as_operator(A).matvec(x)


def rmatvec(A, x: Array) -> Array:
    return as_operator(A).rmatvec(x)
