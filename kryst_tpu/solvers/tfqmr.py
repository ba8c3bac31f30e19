"""TFQMR — transpose-free QMR (Freund; the PETSc-style variant).

TPU-native redesign of the reference TfqmrSolver (src/solver/tfqmr.rs):
the two-substep inner loop m ∈ {1,2} (tfqmr.rs:157-198) is inlined so one
``while_loop`` iteration advances a full step k; the residual estimate is
``dpest = sqrt(2k+m+2) · tau`` (tfqmr.rs:186); psi/c/eta recurrences as in
Barrett et al. "Templates".

Documented deviation: the reference zeroes the initial guess on entry
(tfqmr.rs:72); this implementation honors ``x0`` like every other solver
(with ``x0=None`` the behaviors coincide).
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
    safe_div, prepare_loop)


class _Carry(NamedTuple):
    x: Array
    w: Array
    y1: Array
    u1: Array
    v: Array
    d: Array
    tau: Array
    theta: Array
    eta: Array
    rho: Array
    it: Array
    res: Array
    done: Array
    breakdown: Array
    hist: Optional[Array]


def tfqmr(
    A,
    b,
    x0=None,
    *,
    tol: float = 1e-8,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    breakdown_tol: float = 1e-30,
    record_history: bool = False,
    axis_name: Optional[str] = None,
):
    A = prepare_loop(as_operator(A, dtype=jnp.asarray(b).dtype))
    b = jnp.asarray(b)
    x = default_x0(b, x0)
    maxiter = b.shape[0] if maxiter is None else maxiter

    r0 = b - A.matvec(x)
    rstar = r0
    res0 = jnp.sqrt(dot(r0, r0, axis_name))
    threshold = jnp.maximum(tol * res0, atol)
    hist = init_history(maxiter, res0, record_history)

    u1 = A.matvec(r0)
    init = _Carry(
        x=x, w=r0, y1=r0, u1=u1, v=u1, d=jnp.zeros_like(b),
        tau=res0, theta=jnp.zeros_like(res0), eta=jnp.zeros_like(res0),
        rho=dot(rstar, r0, axis_name),
        it=jnp.int32(0), res=res0, done=res0 <= threshold,
        breakdown=jnp.int32(Breakdown.NONE), hist=hist,
    )

    def cond(s: _Carry):
        return (~s.done) & (s.it < maxiter)

    def body(c: _Carry) -> _Carry:
        sigma = dot(rstar, c.v, axis_name)
        sigma_break = jnp.abs(sigma) < breakdown_tol
        alpha = safe_div(c.rho, sigma)
        y2 = c.y1 - alpha * c.v
        u2 = A.matvec(y2)

        k = c.it.astype(c.tau.dtype)

        def substep(m_idx, ym, um, w, d, tau, theta, eta, x):
            w = w - alpha * um
            d = ym + safe_div(theta * theta * eta, alpha) * d
            theta = safe_div(jnp.sqrt(dot(w, w, axis_name)), tau)
            cfac = 1.0 / jnp.sqrt(1.0 + theta * theta)
            tau = tau * theta * cfac
            eta = cfac * cfac * alpha
            x = x + eta * d
            # dpest = sqrt(2k+m+2) * tau (tfqmr.rs:186)
            dpest = jnp.sqrt(2.0 * k + m_idx + 2.0) * tau
            return w, d, tau, theta, eta, x, dpest

        w, d, tau, theta, eta, x1, dp1 = substep(
            1.0, c.y1, c.u1, c.w, c.d, c.tau, c.theta, c.eta, c.x
        )
        w, d, tau, theta, eta, x2, dp2 = substep(2.0, y2, u2, w, d, tau, theta, eta, x1)
        # if the first substep already met the tolerance, freeze at x1
        first_hit = dp1 <= threshold
        x_new = jnp.where(first_hit, x1, x2)
        res = jnp.where(first_hit, dp1, dp2)
        # freeze the iterate on sigma breakdown (alpha and both substeps are
        # garbage when |sigma| ~ 0)
        x_new = jnp.where(sigma_break, c.x, x_new)
        res = jnp.where(sigma_break, c.res, res)

        rho_new = dot(rstar, w, axis_name)
        rho_break = jnp.abs(rho_new) < breakdown_tol
        beta = safe_div(rho_new, c.rho)
        y1 = w + beta * y2
        u1 = A.matvec(y1)
        v = u1 + beta * (u2 + beta * c.v)

        it = c.it + 1
        reached = res <= threshold
        broke = sigma_break | (rho_break & ~reached)
        done = reached | broke
        brk = jnp.where(broke, jnp.int32(Breakdown.SCALAR_BREAKDOWN), c.breakdown)
        hist_new = push_history(c.hist, it, res)
        return _Carry(
            x=x_new, w=w, y1=y1, u1=u1, v=v, d=d, tau=tau, theta=theta, eta=eta,
            rho=rho_new, it=it, res=res, done=done, breakdown=brk, hist=hist_new,
        )

    final = lax.while_loop(cond, body, init)
    # the reported residual is the QMR estimate; recompute the true one at exit
    r_true = b - A.matvec(final.x)
    res_true = jnp.sqrt(dot(r_true, r_true, axis_name))
    stats = make_stats(
        final.it,
        res_true,
        safe_div(res_true, res0),
        final.res <= threshold,
        final.breakdown,
        maxiter,
        final.hist,
    )
    return final.x, stats
