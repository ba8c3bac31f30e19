"""Pipelined (communication-hiding) preconditioned CG.

Ghysels & Vanroose 2014 ("Hiding global synchronization latency in the
preconditioned Conjugate Gradient algorithm") — the algorithm the
reference's PCA-GMRES cites alongside (pca_gmres.rs:18-20) and the
TPU-native answer to its non-blocking-MPI machinery: both reductions of a
CG step are FUSED into one, and the recurrence is restructured so the
matvec+PC application for the *next* step carries no data dependency on
the in-flight reduction. On MPI that overlap is an Iallreduce; under XLA
it is a graph property — the compiler's latency-hiding scheduler can
overlap the psum with A·m because nothing on one path consumes the other.

Per iteration: 1 matvec, 1 PC apply, ONE fused (gamma, delta) reduction
(= one psum on a mesh), and 8 axpys. Mathematically equivalent to PCG in
exact arithmetic; the extra recurrences add O(sqrt(eps)) residual drift,
the documented trade-off of the method.
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
    fused_dots,
    init_history,
    push_history,
    safe_div, prepare_loop)


class _Carry(NamedTuple):
    x: Array
    r: Array
    u: Array  # M^-1 r
    w: Array  # A u
    p: Array
    s: Array  # A p
    q: Array  # M^-1 s
    z: Array  # A q
    gamma: Array
    alpha: Array
    it: Array
    res: Array
    done: Array
    breakdown: Array
    hist: Optional[Array]


def pipecg(
    A,
    b,
    x0=None,
    *,
    M=None,
    tol: float = 1e-8,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    replace_every: int = 50,
    record_history: bool = False,
    axis_name: Optional[str] = None,
):
    """Returns ``(x, SolveStats)``. Equivalent to :func:`kryst_tpu.pcg` with
    one fused reduction per iteration (Ghysels–Vanroose Algorithm 4).

    ``replace_every``: period of *residual replacement* (Cools–Vanroose
    stabilization): every k iterations the recurred vectors r/u/w/s/q/z are
    recomputed from x and p directly, resetting the O(sqrt(eps)) drift the
    extra recurrences accumulate — essential in f32. 0 disables.

    In f32, once the residual stagnates at its attainable-accuracy floor
    (~eps*kappa, worse for pipelined than plain CG), the denominator
    recurrence loses all significance and the solve stops with
    ``breakdown = INDEFINITE_MATRIX`` rather than spinning; the reported
    ``final_residual`` is the TRUE residual (recomputed), so stats stay
    honest. For rtol below the f32 floor use
    :func:`kryst_tpu.solvers.refine.refined_solve`.
    """
    A = prepare_loop(as_operator(A, dtype=jnp.asarray(b).dtype))
    M = prepare_loop(M)
    b = jnp.asarray(b)
    x = default_x0(b, x0)
    maxiter = b.shape[0] if maxiter is None else maxiter
    apply_M = (lambda v: v) if M is None else M.apply

    r = b - A.matvec(x)
    u = apply_M(r)
    w = A.matvec(u)
    gamma0, rr0 = fused_dots([(r, u), (r, r)], axis_name)
    res0 = jnp.sqrt(rr0)
    threshold = jnp.maximum(tol * res0, atol)
    hist = init_history(maxiter, res0, record_history)
    zero = jnp.zeros_like(b)

    init = _Carry(
        x=x, r=r, u=u, w=w, p=zero, s=zero, q=zero, z=zero,
        gamma=jnp.ones_like(res0), alpha=jnp.ones_like(res0),
        it=jnp.int32(0), res=res0, done=res0 <= threshold,
        breakdown=jnp.int32(Breakdown.NONE), hist=hist,
    )

    def cond(c: _Carry):
        return (~c.done) & (c.it < maxiter)

    def body(c: _Carry) -> _Carry:
        # ONE fused reduction: gamma = <r,u>, delta = <w,u>, rr = <r,r>
        gamma, delta, rr = fused_dots(
            [(c.r, c.u), (c.w, c.u), (c.r, c.r)], axis_name
        )
        # overlappable work: m = M^-1 w, n = A m (independent of the dots)
        m = apply_M(c.w)
        nvec = A.matvec(m)

        res = jnp.sqrt(jnp.maximum(rr, 0.0))
        # note: rr is <r,r> of the *incoming* r; the freshest residual norm
        # lags one iteration — the standard pipelined-CG trade
        reached = res <= threshold

        first = c.it == 0
        beta = jnp.where(first, 0.0, safe_div(gamma, c.gamma))
        denom = delta - beta * safe_div(gamma, c.alpha)
        alpha = jnp.where(
            first, safe_div(gamma, delta), safe_div(gamma, denom)
        )
        # denom <= 0 near convergence is f32 cancellation (gamma -> 0), not
        # a genuinely indefinite operator: only flag breakdown when the
        # residual is still above tolerance
        indefinite = jnp.where(first, delta <= 0, denom <= 0) & ~reached

        p = c.u + beta * c.p
        s = c.w + beta * c.s
        q = m + beta * c.q
        z = nvec + beta * c.z
        # freeze the iterate on breakdown (alpha is garbage then)
        x_new = jnp.where(indefinite, c.x, c.x + alpha * p)
        r_new = c.r - alpha * s
        u_new = c.u - alpha * q
        w_new = c.w - alpha * z

        it = c.it + 1
        if replace_every:
            # periodic residual replacement: recompute the recurred vectors
            # from x and p exactly (two matvecs + two PC applies)
            def replaced(args):
                x_, p_ = args
                r_ = b - A.matvec(x_)
                u_ = apply_M(r_)
                w_ = A.matvec(u_)
                s_ = A.matvec(p_)
                q_ = apply_M(s_)
                z_ = A.matvec(q_)
                return r_, u_, w_, s_, q_, z_

            def kept(args):
                return r_new, u_new, w_new, s, q, z

            do_replace = (it % replace_every) == 0
            r_new, u_new, w_new, s, q, z = lax.cond(
                do_replace, replaced, kept, (x_new, p)
            )

        done = reached | indefinite
        brk = jnp.where(
            indefinite, jnp.int32(Breakdown.INDEFINITE_MATRIX), c.breakdown
        )
        hist_new = push_history(c.hist, it, res)
        return _Carry(
            x=x_new, r=r_new, u=u_new, w=w_new, p=p, s=s, q=q, z=z,
            gamma=gamma, alpha=alpha, it=it, res=res, done=done,
            breakdown=brk, hist=hist_new,
        )

    final = lax.while_loop(cond, body, init)
    r_true = b - A.matvec(final.x)
    res_true = jnp.sqrt(dot(r_true, r_true, axis_name))
    stats = make_stats(
        final.it,
        res_true,
        safe_div(res_true, res0),
        res_true <= threshold,
        final.breakdown,
        maxiter,
        final.hist,
    )
    return final.x, stats
