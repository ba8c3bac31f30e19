"""Conjugate Gradient Squared (Sonneveld; Saad §7.2).

TPU-native redesign of the reference CgsSolver (src/solver/cgs.rs): u/p/q
recurrences (cgs.rs:83-124) with the rho breakdown check (cgs.rs:80-82) as
a carry flag. Like the reference, CGS takes no preconditioner (cgs.rs:59).
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
    u: Array
    p: Array
    q: Array
    rho: Array
    it: Array
    res: Array
    done: Array
    breakdown: Array
    hist: Optional[Array]


def cgs(
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
    rhat = r0
    res0 = jnp.sqrt(dot(r0, r0, axis_name))
    threshold = jnp.maximum(tol * res0, atol)
    hist = init_history(maxiter, res0, record_history)

    init = _Carry(
        x, r0, r0, r0, jnp.zeros_like(b), dot(rhat, r0, axis_name),
        jnp.int32(0), res0, res0 <= threshold, jnp.int32(Breakdown.NONE), hist,
    )

    def cond(s: _Carry):
        return (~s.done) & (s.it < maxiter)

    def body(s: _Carry) -> _Carry:
        v = A.matvec(s.p)
        sigma = dot(rhat, v, axis_name)
        sigma_break = jnp.abs(sigma) < breakdown_tol
        alpha = safe_div(s.rho, sigma)
        q = s.u - alpha * v
        uq = s.u + q
        # freeze the iterate on sigma breakdown (alpha is garbage)
        x_new = jnp.where(sigma_break, s.x, s.x + alpha * uq)
        r_new = jnp.where(sigma_break, s.r, s.r - alpha * A.matvec(uq))
        rho_new = dot(rhat, r_new, axis_name)
        rho_break = jnp.abs(rho_new) < breakdown_tol  # cgs.rs:80-82
        beta = safe_div(rho_new, s.rho)
        u_new = r_new + beta * q
        p_new = u_new + beta * (q + beta * s.p)
        res = jnp.sqrt(dot(r_new, r_new, axis_name))
        it = s.it + 1
        reached = res <= threshold
        broke = sigma_break | (rho_break & ~reached)
        done = reached | broke
        brk = jnp.where(broke, jnp.int32(Breakdown.SCALAR_BREAKDOWN), s.breakdown)
        hist_new = push_history(s.hist, it, res)
        return _Carry(
            x_new, r_new, u_new, p_new, q, rho_new, it, res, done, brk, hist_new
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
