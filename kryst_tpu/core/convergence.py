"""Convergence control and solve statistics.

TPU-native rework of the reference's stopping rule and stats
(reference: src/utils/convergence.rs:4-35, src/error.rs:6-19).

Design notes
------------
Inside ``jax.jit`` / ``lax.while_loop`` we cannot raise exceptions, so the
reference's ``KError`` enum (error.rs:6-19) becomes an integer *breakdown
code* carried through the solver loop and reported in :class:`SolveStats`.

The reference's ``Convergence::check`` (convergence.rs:16-35) has a
documented quirk: reaching ``max_iters`` sets ``converged = true``. We
replicate that semantics in the ``converged`` field for parity, and
additionally report the honest ``reached_tol`` flag.
"""
from __future__ import annotations

import enum
from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax import Array


class Breakdown(enum.IntEnum):
    """Numerical-breakdown codes (the jit-safe analogue of KError, error.rs:6-19)."""

    NONE = 0
    #: p^T A p <= 0 in CG/PCG (error.rs: IndefiniteMatrix; cg.rs:168-174)
    INDEFINITE_MATRIX = 1
    #: beta < 0 in PCG (error.rs: IndefinitePreconditioner; pcg.rs:206-213)
    INDEFINITE_PRECONDITIONER = 2
    #: zero pivot / zero diagonal during a factorization or sweep (error.rs: ZeroPivot)
    ZERO_PIVOT = 3
    #: scalar recurrence broke down (rho/sigma/omega ~ 0 in BiCGStab/CGS/QMR/TFQMR)
    SCALAR_BREAKDOWN = 4
    #: happy breakdown in Arnoldi (gmres.rs:98-100) — not an error, solution is exact
    HAPPY = 5


class NormType(enum.Enum):
    """Residual-norm flavor, mirroring CgNormType (reference cg.rs:35)."""

    PRECONDITIONED = "preconditioned"  # ||z|| = ||M^{-1} r||
    UNPRECONDITIONED = "unpreconditioned"  # ||r||
    NATURAL = "natural"  # sqrt(<r, z>)
    NONE = "none"  # no norm: run to max_iters


class SolveStats(NamedTuple):
    """Solve statistics pytree (reference ``SolveStats``, convergence.rs:10-14).

    All fields are 0-d device arrays so the struct can flow out of jit.
    ``residual_history`` is an optional fixed-size ``(maxiter + 1,)`` buffer
    padded with NaN past ``iterations`` (the jit-able version of the
    reference's ``residual_history: Vec<T>``, cg.rs:47).
    """

    iterations: Array  # int32: number of iterations performed
    final_residual: Array  # absolute residual norm at exit
    rel_residual: Array  # final_residual / res0
    converged: Array  # bool: reference semantics (tol reached OR max_iters hit)
    reached_tol: Array  # bool: honest flag — tolerance actually reached
    breakdown: Array  # int32: Breakdown code
    residual_history: Optional[Array] = None
    #: set by solve(refine="auto") when the result came from mixed-precision
    #: refinement (the rel_residual is then a TRUE f64 residual)
    refined: Optional[Array] = None


def make_stats(
    iterations,
    final_residual,
    rel_residual,
    reached_tol,
    breakdown,
    maxiter: int,
    residual_history=None,
) -> SolveStats:
    """Assemble SolveStats with the reference's converged-at-maxiter quirk
    (convergence.rs:25: ``converged = rel <= tol || i >= max_iters``)."""
    iterations = jnp.asarray(iterations, jnp.int32)
    reached_tol = jnp.asarray(reached_tol, bool)
    converged = reached_tol | (iterations >= maxiter)
    return SolveStats(
        iterations=iterations,
        final_residual=jnp.asarray(final_residual),
        rel_residual=jnp.asarray(rel_residual),
        converged=converged,
        reached_tol=reached_tol,
        breakdown=jnp.asarray(breakdown, jnp.int32),
        residual_history=residual_history,
    )


class Convergence(NamedTuple):
    """Stopping rule: relative residual below ``tol``, capped at ``max_iters``
    (reference Convergence, convergence.rs:4-8)."""

    tol: float = 1e-8
    max_iters: int = 1000

    def check(self, res, res0, iters):
        """Return (rel, converged) with reference semantics (convergence.rs:16-35)."""
        rel = jnp.where(res0 > 0, res / res0, jnp.zeros_like(res))
        converged = (rel <= self.tol) | (iters >= self.max_iters)
        return rel, converged


def rel_tolerance(res0, tol: float, atol: float = 0.0):
    """Absolute stopping threshold max(tol * ||r0||, atol)."""
    return jnp.maximum(tol * res0, atol)
