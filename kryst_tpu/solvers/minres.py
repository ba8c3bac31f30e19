"""MINRES (Paige & Saunders; Saad §7.4) for symmetric indefinite systems.

TPU-native redesign of the reference MinresSolver (src/solver/minres.rs):
Lanczos three-term recurrence (minres.rs:115-134), Givens parameters
(minres.rs:145-150), w-recurrence solution update (minres.rs:152-165), and
best-so-far tracking by the estimated residual phibar (minres.rs:202-205).

Deviations from the reference (documented): no per-iteration debug printing
(minres.rs:177-184 leaves println! in the hot loop), and convergence is
checked on the O(1) phibar estimate instead of recomputing the true
residual every iteration (minres.rs:173-180) — set ``true_residual=True``
to reproduce the reference's per-iteration recompute.
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
    r1: Array
    r2: Array
    v_y: Array  # current Lanczos residual direction (pre-normalization)
    w: Array
    w2: Array
    oldb: Array
    beta: Array
    dbar: Array
    epsln: Array
    phibar: Array
    cs: Array
    sn: Array
    x_best: Array
    res_best: Array
    it: Array
    res: Array
    done: Array
    breakdown: Array
    hist: Optional[Array]


def minres(
    A,
    b,
    x0=None,
    *,
    tol: float = 1e-8,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    true_residual: bool = False,
    record_history: bool = False,
    axis_name: Optional[str] = None,
):
    A = prepare_loop(as_operator(A, dtype=jnp.asarray(b).dtype))
    b = jnp.asarray(b)
    x = default_x0(b, x0)
    maxiter = b.shape[0] * 2 if maxiter is None else maxiter

    r0 = b - A.matvec(x)
    beta1 = jnp.sqrt(dot(r0, r0, axis_name))
    res0 = beta1
    threshold = jnp.maximum(tol * res0, atol)
    hist = init_history(maxiter, res0, record_history)
    zero = jnp.zeros_like(b)
    zscal = jnp.zeros_like(res0)

    init = _Carry(
        x=x, r1=r0, r2=r0, v_y=r0, w=zero, w2=zero,
        oldb=jnp.ones_like(res0), beta=beta1,
        dbar=zscal, epsln=zscal, phibar=beta1,
        cs=-jnp.ones_like(res0), sn=zscal,
        x_best=x, res_best=beta1,
        it=jnp.int32(0), res=beta1, done=beta1 <= threshold,
        breakdown=jnp.int32(Breakdown.NONE), hist=hist,
    )

    def cond(s: _Carry):
        return (~s.done) & (s.it < maxiter)

    def body(c: _Carry) -> _Carry:
        v = safe_div(c.v_y, c.beta)
        y = A.matvec(v)
        # subtract the beta/oldb * r1 term from the second iteration on
        coef = jnp.where(c.it >= 1, safe_div(c.beta, c.oldb), 0.0)
        y = y - coef * c.r1
        alfa = dot(v, y, axis_name)
        y = y - safe_div(alfa, c.beta) * c.r2
        r1 = c.r2
        r2 = y
        oldb = c.beta
        beta = jnp.sqrt(dot(y, y, axis_name))
        lanczos_break = beta < 1e-30  # invariant subspace found — exact solve

        oldeps = c.epsln
        delta = c.cs * c.dbar + c.sn * alfa
        gbar = c.sn * c.dbar - c.cs * alfa
        epsln = c.sn * beta
        dbar = -c.cs * beta

        gamma = jnp.sqrt(gbar * gbar + beta * beta)
        gamma = jnp.maximum(gamma, jnp.finfo(b.dtype).tiny)
        cs = gbar / gamma
        sn = beta / gamma
        phi = cs * c.phibar
        phibar = sn * c.phibar

        w1 = c.w2
        w2 = c.w
        w = (v - oldeps * w1 - delta * w2) / gamma
        x_new = c.x + phi * w

        if true_residual:
            rr = b - A.matvec(x_new)
            res = jnp.sqrt(dot(rr, rr, axis_name))
        else:
            res = jnp.abs(phibar)

        # best-so-far by estimated residual (minres.rs:202-205)
        better = res < c.res_best
        x_best = jnp.where(better, x_new, c.x_best)
        res_best = jnp.where(better, res, c.res_best)

        it = c.it + 1
        reached = res <= threshold
        done = reached | lanczos_break
        hist_new = push_history(c.hist, it, res)
        return _Carry(
            x=x_new, r1=r1, r2=r2, v_y=y, w=w, w2=w2,
            oldb=oldb, beta=beta, dbar=dbar, epsln=epsln, phibar=phibar,
            cs=cs, sn=sn, x_best=x_best, res_best=res_best,
            it=it, res=res, done=done, breakdown=c.breakdown, hist=hist_new,
        )

    final = lax.while_loop(cond, body, init)
    stats = make_stats(
        final.it,
        final.res_best,
        safe_div(final.res_best, res0),
        final.res_best <= threshold,
        final.breakdown,
        maxiter,
        final.hist,
    )
    return final.x_best, stats
