"""LSQR — Paige & Saunders (1982) least-squares solver via Golub-Kahan
bidiagonalization.

Beyond-reference addition: the reference's rectangular story is CGNR/CGNE
(src/solver/cgnr.rs — CG on the normal equations), whose conditioning is
kappa(A)^2. LSQR solves the same problems min ||b - Ax||_2 (and the damped
variant min ||b - Ax||^2 + damp^2 ||x||^2) with the analytically identical
Krylov iterates but the numerically stable bidiagonalization recurrence —
the standard choice for ill-conditioned rectangular systems. Same
TPU-native shape as every solver here: one ``lax.while_loop``, two matvecs
(A, Aᵀ) per iteration, psum-aware reductions for mesh execution, jit-safe
breakdown flags.

Stopping follows the paper's dual criteria:
- consistent systems: ||r|| <= tol*||b|| (+ atol)
- least-squares: ||Aᵀ r|| <= tol * ||A|| * ||r|| (Frobenius-free running
  estimate of ||A|| from the bidiagonal entries, as in the reference
  implementation of the paper)
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax import Array, lax

from kryst_tpu.core.convergence import Breakdown, make_stats
from kryst_tpu.core.linop import as_operator
from kryst_tpu.solvers._common import (
    dot,
    init_history,
    push_history,
    safe_div, prepare_loop)


class _Carry(NamedTuple):
    x: Array
    u: Array
    v: Array
    w: Array
    alpha: Array
    rhobar: Array
    phibar: Array
    anorm2: Array  # running sum alpha_i^2 + beta_i^2 (+ damp^2)
    rnorm: Array
    arnorm: Array
    it: Array
    done: Array
    breakdown: Array
    hist: Optional[Array]


def lsqr(
    A,
    b,
    x0=None,
    *,
    damp: float = 0.0,
    tol: float = 1e-8,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    record_history: bool = False,
    axis_name: Optional[str] = None,
):
    """min ||b - A x||_2 (+ damp^2 ||x||^2). Returns (x, SolveStats).

    ``SolveStats.residual`` is the estimated ||r||; convergence is reached
    when either ||r|| <= max(tol*||b||, atol) (consistent systems) or
    ||Aᵀ r|| <= tol*||A||*||r|| (least-squares criterion).
    """
    A = prepare_loop(as_operator(A, dtype=jnp.asarray(b).dtype))
    b = jnp.asarray(b)
    nrows, ncols = A.shape if hasattr(A, "shape") else (b.shape[0], b.shape[0])
    x = jnp.zeros(ncols, dtype=b.dtype) if x0 is None else jnp.asarray(x0)
    maxiter = 2 * ncols if maxiter is None else maxiter
    damp = jnp.asarray(damp, dtype=b.dtype)

    u = b - A.matvec(x)
    beta1 = jnp.sqrt(dot(u, u, axis_name))
    u = safe_div(u, beta1)
    v = A.rmatvec(u)
    alpha1 = jnp.sqrt(dot(v, v, axis_name))
    v = safe_div(v, alpha1)

    res0 = beta1
    arnorm0 = alpha1 * beta1
    threshold = jnp.maximum(tol * res0, atol)
    hist = init_history(maxiter, res0, record_history)

    init = _Carry(
        x=x, u=u, v=v, w=v,
        alpha=alpha1, rhobar=alpha1, phibar=beta1,
        anorm2=alpha1 * alpha1 + damp * damp,
        rnorm=res0, arnorm=arnorm0,
        it=jnp.int32(0),
        done=(res0 <= threshold) | (arnorm0 == 0),
        breakdown=jnp.int32(Breakdown.NONE),
        hist=hist,
    )

    def cond(s: _Carry):
        return (~s.done) & (s.it < maxiter)

    def body(s: _Carry) -> _Carry:
        # --- bidiagonalization step ---
        u_new = A.matvec(s.v) - s.alpha * s.u
        beta = jnp.sqrt(dot(u_new, u_new, axis_name))
        u_new = safe_div(u_new, beta)
        v_new = A.rmatvec(u_new) - beta * s.v
        alpha = jnp.sqrt(dot(v_new, v_new, axis_name))
        v_new = safe_div(v_new, alpha)

        # --- damping rotation (no-op for damp == 0) ---
        rhobar1 = jnp.sqrt(s.rhobar * s.rhobar + damp * damp)
        c1 = safe_div(s.rhobar, rhobar1)
        phibar_d = c1 * s.phibar

        # --- plane rotation eliminating beta ---
        rho = jnp.sqrt(rhobar1 * rhobar1 + beta * beta)
        c = safe_div(rhobar1, rho)
        sn = safe_div(beta, rho)
        theta = sn * alpha
        rhobar_new = -c * alpha
        phi = c * phibar_d
        phibar_new = sn * phibar_d

        x_new = s.x + safe_div(phi, rho) * s.w
        w_new = v_new - safe_div(theta, rho) * s.w

        anorm2 = s.anorm2 + beta * beta + alpha * alpha + damp * damp
        # phibar carries a SIGN through the rotations (c1 = rhobar/rhobar1
        # is ±1 at damp=0 because rhobar alternates sign); the residual
        # estimates are magnitudes
        rnorm = jnp.abs(phibar_new)
        arnorm = jnp.abs(phibar_new * alpha * c)

        it = s.it + 1
        # bidiagonalization breakdown (beta or alpha exactly 0) means the
        # Krylov space is exhausted: x is the exact LS solution
        exhausted = (beta == 0) | (alpha == 0)
        ls_done = arnorm <= tol * jnp.sqrt(anorm2) * rnorm
        done = (rnorm <= threshold) | ls_done | exhausted
        brk = jnp.where(
            exhausted & ~(rnorm <= threshold) & ~ls_done,
            jnp.int32(Breakdown.NONE),  # clean termination, not an error
            s.breakdown,
        )
        hist_new = push_history(s.hist, it, rnorm)
        return _Carry(
            x_new, u_new, v_new, w_new, alpha, rhobar_new, phibar_new,
            anorm2, rnorm, arnorm, it, done, brk, hist_new,
        )

    final = lax.while_loop(cond, body, init)
    stats = make_stats(
        final.it,
        final.rnorm,
        safe_div(final.rnorm, res0),
        final.done,
        final.breakdown,
        maxiter,
        final.hist,
    )
    return final.x, stats
