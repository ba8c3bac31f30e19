"""CGNR / CGNE — CG on the normal equations (Saad §8.3).

TPU-native redesign of the reference CgnrSolver/CgneSolver
(src/solver/cgnr.rs). **Fixed reference bug** (documented deviation): the
reference calls ``matvec`` where A^T is mathematically required
(cgnr.rs:90,112,166,188), which is only correct for symmetric A; this
implementation uses ``rmatvec`` so rectangular / nonsymmetric systems are
handled correctly (for symmetric A the two coincide, preserving parity on
the reference's own tests).

- CGNR solves min ||b - Ax||_2 via AᵀA x = Aᵀb (residual variant).
- CGNE (Craig's method) solves AAᵀ y = b, x = Aᵀ y (error variant).
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
    r: Array
    z: Array
    p: Array
    zz: Array
    it: Array
    res: Array
    done: Array
    breakdown: Array
    hist: Optional[Array]


def cgnr(
    A,
    b,
    x0=None,
    *,
    tol: float = 1e-8,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    record_history: bool = False,
    axis_name: Optional[str] = None,
):
    """CG on AᵀA x = Aᵀ b. Converges on ||Aᵀr|| (the normal-equation residual)."""
    A = prepare_loop(as_operator(A, dtype=jnp.asarray(b).dtype))
    b = jnp.asarray(b)
    nrows, ncols = A.shape if hasattr(A, "shape") else (b.shape[0], b.shape[0])
    x = jnp.zeros(ncols, dtype=b.dtype) if x0 is None else jnp.asarray(x0)
    maxiter = ncols * 2 if maxiter is None else maxiter

    r = b - A.matvec(x)
    z = A.rmatvec(r)
    zz0 = dot(z, z, axis_name)
    res0 = jnp.sqrt(zz0)
    threshold = jnp.maximum(tol * res0, atol)
    hist = init_history(maxiter, res0, record_history)

    init = _Carry(
        x, r, z, z, zz0, jnp.int32(0), res0, res0 <= threshold,
        jnp.int32(Breakdown.NONE), hist,
    )

    def cond(s: _Carry):
        return (~s.done) & (s.it < maxiter)

    def body(s: _Carry) -> _Carry:
        w = A.matvec(s.p)
        ww = dot(w, w, axis_name)
        alpha = safe_div(s.zz, ww)
        x_new = s.x + alpha * s.p
        r_new = s.r - alpha * w
        z_new = A.rmatvec(r_new)
        zz_new = dot(z_new, z_new, axis_name)
        beta = safe_div(zz_new, s.zz)
        p_new = z_new + beta * s.p
        res = jnp.sqrt(zz_new)
        it = s.it + 1
        done = (res <= threshold) | (ww == 0)
        brk = jnp.where(ww == 0, jnp.int32(Breakdown.SCALAR_BREAKDOWN), s.breakdown)
        hist_new = push_history(s.hist, it, res)
        return _Carry(x_new, r_new, z_new, p_new, zz_new, it, res, done, brk, hist_new)

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


def cgne(
    A,
    b,
    x0=None,
    *,
    tol: float = 1e-8,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    record_history: bool = False,
    axis_name: Optional[str] = None,
):
    """Craig's method: CG on AAᵀ y = b with x = Aᵀ y. Converges on ||r||."""
    A = prepare_loop(as_operator(A, dtype=jnp.asarray(b).dtype))
    b = jnp.asarray(b)
    nrows, ncols = A.shape if hasattr(A, "shape") else (b.shape[0], b.shape[0])
    x = jnp.zeros(ncols, dtype=b.dtype) if x0 is None else jnp.asarray(x0)
    maxiter = nrows * 2 if maxiter is None else maxiter

    r = b - A.matvec(x)
    rr0 = dot(r, r, axis_name)
    res0 = jnp.sqrt(rr0)
    threshold = jnp.maximum(tol * res0, atol)
    hist = init_history(maxiter, res0, record_history)
    p = A.rmatvec(r)

    init = _Carry(
        x, r, p, p, rr0, jnp.int32(0), res0, res0 <= threshold,
        jnp.int32(Breakdown.NONE), hist,
    )

    def cond(s: _Carry):
        return (~s.done) & (s.it < maxiter)

    def body(s: _Carry) -> _Carry:
        pp = dot(s.p, s.p, axis_name)
        alpha = safe_div(s.zz, pp)  # zz carries <r,r>
        x_new = s.x + alpha * s.p
        r_new = s.r - alpha * A.matvec(s.p)
        rr_new = dot(r_new, r_new, axis_name)
        beta = safe_div(rr_new, s.zz)
        p_new = A.rmatvec(r_new) + beta * s.p
        res = jnp.sqrt(rr_new)
        it = s.it + 1
        done = (res <= threshold) | (pp == 0)
        brk = jnp.where(pp == 0, jnp.int32(Breakdown.SCALAR_BREAKDOWN), s.breakdown)
        hist_new = push_history(s.hist, it, res)
        return _Carry(x_new, r_new, p_new, p_new, rr_new, it, res, done, brk, hist_new)

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
