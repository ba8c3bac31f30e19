"""QMR — quasi-minimal residual (Freund & Nachtigal; Saad §7.3).

TPU-native redesign of the reference QmrSolver (src/solver/qmr.rs): the
coupled two-sided Lanczos recurrence needs both ``matvec`` and ``rmatvec``
(qmr.rs:121-124, the MatTransVec requirement), sigma/rho/delta breakdown
checks become carry flags (qmr.rs:111-128), and — matching the reference —
convergence is checked on the *true* residual recomputed every iteration
(qmr.rs:147-153), costing one extra matvec per step.

Algorithm follows the unpreconditioned QMR of Barrett et al., "Templates
for the Solution of Linear Systems" (the same formulation the reference
implements).
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
    r: Array
    v_tld: Array
    w_tld: Array
    p: Array
    q: Array
    d: Array
    s: Array
    rho: Array
    xi: Array
    gamma: Array
    eta: Array
    theta: Array
    eps: Array
    it: Array
    res: Array
    done: Array
    breakdown: Array
    hist: Optional[Array]


def qmr(
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
    maxiter = b.shape[0] * 2 if maxiter is None else maxiter

    r0 = b - A.matvec(x)
    res0 = jnp.sqrt(dot(r0, r0, axis_name))
    threshold = jnp.maximum(tol * res0, atol)
    hist = init_history(maxiter, res0, record_history)
    zero = jnp.zeros_like(b)
    one = jnp.ones_like(res0)

    init = _Carry(
        x=x, r=r0, v_tld=r0, w_tld=r0,
        p=zero, q=zero, d=zero, s=zero,
        rho=res0, xi=res0, gamma=one, eta=-one, theta=jnp.zeros_like(res0),
        eps=one,
        it=jnp.int32(0), res=res0, done=res0 <= threshold,
        breakdown=jnp.int32(Breakdown.NONE), hist=hist,
    )

    def cond(s: _Carry):
        return (~s.done) & (s.it < maxiter)

    def body(c: _Carry) -> _Carry:
        lanczos_break = (jnp.abs(c.rho) < breakdown_tol) | (
            jnp.abs(c.xi) < breakdown_tol
        )
        v = safe_div(c.v_tld, c.rho)
        w = safe_div(c.w_tld, c.xi)
        delta = dot(w, v, axis_name)
        delta_break = jnp.abs(delta) < breakdown_tol
        # p/q recurrences; on the first iteration p=q=0 so p <- v, q <- w
        p = v - safe_div(c.xi * delta, c.eps) * c.p
        q = w - safe_div(c.rho * delta, c.eps) * c.q
        p_tld = A.matvec(p)
        eps = dot(q, p_tld, axis_name)
        eps_break = jnp.abs(eps) < breakdown_tol
        beta = safe_div(eps, delta)
        beta_break = jnp.abs(beta) < breakdown_tol
        v_tld = p_tld - beta * v
        rho_new = jnp.sqrt(dot(v_tld, v_tld, axis_name))
        w_tld = A.rmatvec(q) - beta * w
        xi_new = jnp.sqrt(dot(w_tld, w_tld, axis_name))
        theta_new = safe_div(rho_new, c.gamma * jnp.abs(beta))
        gamma_new = 1.0 / jnp.sqrt(1.0 + theta_new * theta_new)
        gamma_break = jnp.abs(gamma_new) < breakdown_tol
        eta_new = safe_div(
            -c.eta * c.rho * gamma_new * gamma_new, beta * c.gamma * c.gamma
        )
        tg2 = (c.theta * gamma_new) ** 2
        d = eta_new * p + tg2 * c.d
        svec = eta_new * p_tld + tg2 * c.s
        broke = lanczos_break | delta_break | eps_break | beta_break | gamma_break
        # freeze the iterate on breakdown — the recurrence scalars are garbage
        x_new = jnp.where(broke, c.x, c.x + d)
        # true residual each iteration, matching the reference (qmr.rs:147-153)
        r_new = b - A.matvec(x_new)
        res = jnp.sqrt(dot(r_new, r_new, axis_name))
        it = c.it + 1
        reached = res <= threshold
        broke = broke & ~reached
        done = reached | broke
        brk = jnp.where(broke, jnp.int32(Breakdown.SCALAR_BREAKDOWN), c.breakdown)
        hist_new = push_history(c.hist, it, res)
        return _Carry(
            x=x_new, r=r_new, v_tld=v_tld, w_tld=w_tld, p=p, q=q, d=d, s=svec,
            rho=rho_new, xi=xi_new, gamma=gamma_new, eta=eta_new,
            theta=theta_new, eps=eps,
            it=it, res=res, done=done, breakdown=brk, hist=hist_new,
        )

    final = lax.while_loop(cond, body, init)
    stats = make_stats(
        final.it,
        final.res,
        safe_div(final.res, res0),
        final.res <= threshold,
        final.breakdown,
        maxiter,
        final.hist,
    )
    return final.x, stats
