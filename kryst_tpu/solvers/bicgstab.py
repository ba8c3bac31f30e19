"""BiCGStab (van der Vorst; Saad §7.1).

TPU-native redesign of the reference BiCgStabSolver (src/solver/bicgstab.rs):
shadow residual, rho/alpha/omega recurrences, the three scalar-breakdown
checks (bicgstab.rs:117-119,161-163,235-237,285-287) as carry flags, and
the early exit on a small ||s|| (bicgstab.rs:189-206).

The reference ignores its ``pc`` argument (bicgstab.rs:70); here ``M=None``
reproduces that, and a supplied ``M`` runs the standard right-preconditioned
variant (p̂ = M⁻¹p, ŝ = M⁻¹s) — a documented capability extension.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax import Array, lax

from kryst_tpu.core.convergence import Breakdown, make_stats
from kryst_tpu.core.linop import as_operator
from kryst_tpu.solvers._common import (
    default_x0,
    dot,
    init_history,
    push_history,
    safe_div,
    use_true_residual, prepare_loop)


class _Carry(NamedTuple):
    x: Array
    r: Array
    p: Array
    v: Array
    rho: Array
    alpha: Array
    omega: Array
    it: Array
    res: Array
    done: Array
    breakdown: Array
    hist: Optional[Array]


def bicgstab(
    A,
    b,
    x0=None,
    *,
    M=None,
    tol: float = 1e-8,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    breakdown_tol: float = 1e-30,
    record_history: bool = False,
    axis_name: Optional[str] = None,
    true_residual: Optional[bool] = None,
):
    """Returns ``(x, SolveStats)``.

    ``true_residual``: recompute ``b - A x`` once after the loop and report
    stats from it; ``None`` auto-enables below f64 (see
    :func:`kryst_tpu.solvers.cg.cg`).
    """
    A = prepare_loop(as_operator(A, dtype=jnp.asarray(b).dtype))
    M = prepare_loop(M)
    b = jnp.asarray(b)
    x = default_x0(b, x0)
    maxiter = b.shape[0] * 2 if maxiter is None else maxiter
    apply_M = (lambda v: v) if M is None else M.apply

    r0 = b - A.matvec(x)
    rhat = r0  # shadow residual (bicgstab.rs:78)
    res0 = jnp.sqrt(dot(r0, r0, axis_name))
    threshold = jnp.maximum(tol * res0, atol)
    hist = init_history(maxiter, res0, record_history)

    init = _Carry(
        x, r0, jnp.zeros_like(b), jnp.zeros_like(b),
        jnp.ones_like(res0), jnp.ones_like(res0), jnp.ones_like(res0),
        jnp.int32(0), res0, res0 <= threshold, jnp.int32(Breakdown.NONE), hist,
    )

    def cond(s: _Carry):
        return (~s.done) & (s.it < maxiter)

    def body(s: _Carry) -> _Carry:
        rho_new = dot(rhat, s.r, axis_name)
        rho_break = jnp.abs(rho_new) < breakdown_tol
        beta = safe_div(rho_new * s.alpha, s.rho * s.omega)
        p = s.r + beta * (s.p - s.omega * s.v)
        phat = apply_M(p)
        v = A.matvec(phat)
        sigma = dot(rhat, v, axis_name)
        sigma_break = jnp.abs(sigma) < breakdown_tol
        alpha = safe_div(rho_new, sigma)
        svec = s.r - alpha * v
        s_norm = jnp.sqrt(dot(svec, svec, axis_name))
        # early exit on small ||s|| (bicgstab.rs:189-206)
        early = s_norm <= threshold
        shat = apply_M(svec)
        t = A.matvec(shat)
        tt = dot(t, t, axis_name)
        ts = dot(t, svec, axis_name)
        omega = safe_div(ts, tt)
        omega_break = (jnp.abs(omega) < breakdown_tol) | (tt < breakdown_tol)

        x_full = s.x + alpha * phat + omega * shat
        x_early = s.x + alpha * phat
        x_new = jnp.where(early, x_early, x_full)
        r_new = jnp.where(early, svec, svec - omega * t)
        res = jnp.where(early, s_norm, jnp.sqrt(dot(r_new, r_new, axis_name)))

        it = s.it + 1
        broke = rho_break | sigma_break | (omega_break & ~early)
        # on breakdown the current step's scalars are garbage (safe_div of a
        # ~0 denominator): freeze the iterate at the last good x, as the
        # reference and the NumPy oracle do
        x_new = jnp.where(broke, s.x, x_new)
        r_new = jnp.where(broke, s.r, r_new)
        res = jnp.where(broke, s.res, res)
        reached = res <= threshold
        done = reached | broke | early
        brk = jnp.where(broke, jnp.int32(Breakdown.SCALAR_BREAKDOWN), s.breakdown)
        hist_new = push_history(s.hist, it, res)
        return _Carry(
            x_new, r_new, p, v, rho_new, alpha, omega, it, res, done, brk, hist_new
        )

    final = lax.while_loop(cond, body, init)
    res_out = final.res
    if use_true_residual(true_residual, b.dtype):
        r_true = b - A.matvec(final.x)
        res_out = jnp.sqrt(dot(r_true, r_true, axis_name))
    stats = make_stats(
        final.it,
        res_out,
        safe_div(res_out, res0),
        res_out <= threshold,
        final.breakdown,
        maxiter,
        final.hist,
    )
    return final.x, stats
