"""Direct dense solvers: LU and QR with cached factorizations.

TPU-native redesign of the reference LuSolver/QrSolver
(src/solver/direct_lu.rs:24-142). The reference caches its faer
factorization for reuse (``solve_cached``, direct_lu.rs:26-52); here the
factorization is an explicit pytree state so caching is just holding on to
it (and it passes through jit):

    state = lu_factor(A); x = lu_solve(state, b)   # reuse state freely

QR handles square and rectangular (least-squares) systems
(direct_lu.rs:99-142).
"""
from __future__ import annotations

import dataclasses
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax import Array
from jax.tree_util import register_dataclass

from kryst_tpu.core.convergence import Breakdown, make_stats
from kryst_tpu.core.linop import as_operator


@dataclasses.dataclass(frozen=True)
class LUFactorization:
    lu: Array
    piv: Array

    def solve(self, b: Array) -> Array:
        return jsl.lu_solve((self.lu, self.piv), b)


register_dataclass(LUFactorization, data_fields=["lu", "piv"], meta_fields=[])


@dataclasses.dataclass(frozen=True)
class QRFactorization:
    q: Array
    r: Array

    def solve(self, b: Array) -> Array:
        # min ||b - A x||: x = R^{-1} Q^T b (reduced QR)
        return jsl.solve_triangular(self.r, self.q.T @ b, lower=False)


register_dataclass(QRFactorization, data_fields=["q", "r"], meta_fields=[])


def _densify(A):
    if hasattr(A, "todense"):
        return A.todense()
    if hasattr(A, "a"):
        return A.a
    raise TypeError(
        f"direct solvers need a materializable matrix; {type(A).__name__} "
        "has neither .todense() nor a dense array — use an iterative solver "
        "or provide a Dense/ELL/DIA operator"
    )


def lu_factor(A, dtype=None) -> LUFactorization:
    A = as_operator(A, dtype=dtype)
    lu, piv = jsl.lu_factor(_densify(A))
    return LUFactorization(lu, piv)


def lu_solve(A_or_state, b):
    """Solve with LU; accepts an operator/array or a cached factorization.

    Returns ``(x, SolveStats)`` for API uniformity with the iterative path.
    """
    state = (A_or_state if isinstance(A_or_state, LUFactorization)
         else lu_factor(A_or_state, dtype=jnp.asarray(b).dtype))
    b = jnp.asarray(b)
    x = state.solve(b)
    zero_pivot = jnp.any(jnp.diagonal(state.lu) == 0)
    stats = make_stats(
        jnp.int32(1),
        jnp.zeros((), b.dtype),
        jnp.zeros((), b.dtype),
        ~zero_pivot,
        jnp.where(zero_pivot, jnp.int32(Breakdown.ZERO_PIVOT), jnp.int32(0)),
        1,
    )
    return x, stats


def qr_factor(A, dtype=None) -> QRFactorization:
    A = as_operator(A, dtype=dtype)
    q, r = jnp.linalg.qr(_densify(A), mode="reduced")
    return QRFactorization(q, r)


def qr_solve(A_or_state, b):
    """Solve (or least-squares solve, for rectangular A) via QR."""
    state = (A_or_state if isinstance(A_or_state, QRFactorization)
             else qr_factor(A_or_state, dtype=jnp.asarray(b).dtype))
    b = jnp.asarray(b)
    x = state.solve(b)
    zero_pivot = jnp.any(jnp.diagonal(state.r) == 0)
    stats = make_stats(
        jnp.int32(1),
        jnp.zeros((), b.dtype),
        jnp.zeros((), b.dtype),
        ~zero_pivot,
        jnp.where(zero_pivot, jnp.int32(Breakdown.ZERO_PIVOT), jnp.int32(0)),
        1,
    )
    return x, stats
