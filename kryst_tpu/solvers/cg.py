"""Conjugate Gradient solvers as ``lax.while_loop`` kernels.

TPU-native redesign of the reference's CG/PCG (src/solver/cg.rs,
src/solver/pcg.rs; algorithms: Saad §6.1 / §9.2). The iteration carry is a
NamedTuple pytree; numerical breakdown becomes a flag in the carry instead
of an error (cg.rs:168-174, pcg.rs:162-172,206-213), because nothing can
raise inside jit.

Feature parity with the reference:
- norm types Preconditioned / Unpreconditioned / Natural / None (cg.rs:35)
- ``single_reduction``: Chronopoulos–Gear recurrence so each iteration has
  exactly ONE fused reduction (cg.rs:146-165, pcg.rs:151-160). On a device
  mesh that is one psum per iteration instead of two — the
  latency-hiding restructure the reference approximates with fused dots.
- trust-region (Steihaug–Toint) radius and objective-target early exit on
  CG (cg.rs:177-202, 231-252)
- residual history buffer (cg.rs:47,140,263)
- plain ``cg`` takes no preconditioner, matching the reference quirk that
  ``CgSolver`` ignores its ``pc`` argument (cg.rs:115); use ``pcg`` for the
  preconditioned path.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax import Array, lax

from kryst_tpu.core.convergence import Breakdown, NormType, make_stats
from kryst_tpu.core.linop import as_operator
from kryst_tpu.solvers._common import (
    default_x0,
    prepare_loop,
    emit_monitor,
    dot,
    fused_dots,
    init_history,
    push_history,
    safe_div,
    use_true_residual,
)


class _CGCarry(NamedTuple):
    x: Array
    r: Array
    p: Array
    ap: Array  # A @ p (only used by the single-reduction recurrence)
    rr: Array
    pap: Array  # previous p^T A p (single-reduction recurrence)
    obj: Array
    it: Array
    res: Array
    done: Array
    breakdown: Array
    hist: Optional[Array]


def _boundary_tau(x, p, radius, axis_name=None):
    """Positive root of ||x + tau p||^2 = radius^2 (Steihaug–Toint step)."""
    xp = dot(x, p, axis_name)
    pp = dot(p, p, axis_name)
    xx = dot(x, x, axis_name)
    disc = jnp.maximum(xp * xp + pp * (radius * radius - xx), 0.0)
    return safe_div(-xp + jnp.sqrt(disc), pp)


def cg(
    A,
    b,
    x0=None,
    *,
    tol: float = 1e-8,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    norm_type: NormType = NormType.UNPRECONDITIONED,
    single_reduction: bool = False,
    radius: Optional[float] = None,
    obj_target: Optional[float] = None,
    record_history: bool = False,
    monitor=None,
    axis_name: Optional[str] = None,
    true_residual: Optional[bool] = None,
):
    """Unpreconditioned CG (reference CgSolver, cg.rs; Saad §6.1).

    Returns ``(x, SolveStats)``. Note the reference's CgSolver silently
    ignores any preconditioner (cg.rs:115); this function has no ``M``
    parameter by design — use :func:`pcg`.

    ``true_residual``: recompute ``b - A x`` once after the loop and report
    stats (final_residual / rel_residual / reached_tol) from it. ``None``
    (default) auto-enables below f64, where the recursive residual can be
    wrong by orders of magnitude at its eps*kappa floor.
    """
    if radius is not None and single_reduction:
        raise ValueError(
            "trust-region radius is only implemented for the standard "
            "recurrence; use single_reduction=False"
        )
    A = prepare_loop(as_operator(A, dtype=jnp.asarray(b).dtype))
    b = jnp.asarray(b)
    x = default_x0(b, x0)
    n = b.shape[0]
    maxiter = n if maxiter is None else maxiter

    r = b - A.matvec(x)
    rr0 = dot(r, r, axis_name)
    res0 = jnp.sqrt(rr0)
    threshold = jnp.maximum(tol * res0, atol)
    check_norm = norm_type != NormType.NONE

    # objective value q(x) = 0.5 x^T A x - b^T x, tracked incrementally:
    # q_{k+1} = q_k - 0.5 * alpha * rr_k (exact for CG updates).
    if obj_target is not None:
        ax0 = A.matvec(x)
        obj0 = 0.5 * dot(x, ax0, axis_name) - dot(b, x, axis_name)
    else:
        obj0 = jnp.zeros_like(res0)

    hist = init_history(maxiter, res0, record_history)

    # Seed for the single-reduction (Chronopoulos–Gear) recurrence:
    # w = A r; pap_0 = <r, A r>; p_0 = r; Ap_0 = w.
    if single_reduction:
        w = A.matvec(r)
        pap0 = dot(r, w, axis_name)
        init = _CGCarry(
            x, r, r, w, rr0, pap0, obj0,
            jnp.int32(0), res0,
            (res0 <= threshold) & check_norm,
            jnp.int32(Breakdown.NONE), hist,
        )
    else:
        init = _CGCarry(
            x, r, r, jnp.zeros_like(r), rr0, jnp.ones_like(rr0), obj0,
            jnp.int32(0), res0,
            (res0 <= threshold) & check_norm,
            jnp.int32(Breakdown.NONE), hist,
        )

    def cond(s: _CGCarry):
        return (~s.done) & (s.it < maxiter)

    def body_standard(s: _CGCarry) -> _CGCarry:
        from kryst_tpu.ops.fused import cg_fused_update

        if hasattr(A, "matvec_dot") and axis_name is None:
            ap, pap = A.matvec_dot(s.p)  # fused SpMV + <p, Ap> (ops/fused.py)
        else:
            ap = A.matvec(s.p)
            pap = dot(s.p, ap, axis_name)
        indefinite = pap <= 0

        alpha = safe_div(s.rr, pap)
        # fused x/r update + <r', r'> in one kernel (ops/fused.py)
        x_new, r_new, rr_local = cg_fused_update(s.x, s.p, s.r, ap, alpha)

        if radius is not None:
            # Steihaug–Toint: on negative curvature or leaving the trust
            # region, step to the boundary along p and stop (cg.rs:177-202).
            xx_new = dot(x_new, x_new, axis_name)
            hit_boundary = xx_new >= radius * radius
            tau = _boundary_tau(s.x, s.p, radius, axis_name)
            take_boundary = indefinite | hit_boundary
            x_new = jnp.where(take_boundary, s.x + tau * s.p, x_new)
            r_new = jnp.where(take_boundary, b - A.matvec(x_new), r_new)
            indefinite = jnp.asarray(False)
            boundary_done = take_boundary
            rr_new = dot(r_new, r_new, axis_name)
        else:
            boundary_done = jnp.asarray(False)
            rr_new = (
                lax.psum(rr_local, axis_name) if axis_name is not None else rr_local
            )
        res = jnp.sqrt(rr_new)
        it = s.it + 1

        obj = s.obj - 0.5 * alpha * s.rr
        obj_done = (
            (obj <= obj_target) if obj_target is not None else jnp.asarray(False)
        )

        reached = (res <= threshold) & check_norm
        done = reached | indefinite | boundary_done | obj_done
        brk = jnp.where(
            indefinite, jnp.int32(Breakdown.INDEFINITE_MATRIX), s.breakdown
        )

        beta = safe_div(rr_new, s.rr)
        p_new = r_new + beta * s.p
        hist_new = push_history(s.hist, it, res)
        emit_monitor(monitor, it, res)
        return _CGCarry(
            x_new, r_new, p_new, s.ap, rr_new, s.pap, obj, it, res, done, brk, hist_new
        )

    def body_single_reduction(s: _CGCarry) -> _CGCarry:
        # Chronopoulos–Gear: one matvec + ONE fused reduction per iteration.
        # Uses p^T A p = <r, Ar> - beta^2 * (previous p^T A p).
        pap = s.pap
        indefinite = pap <= 0
        alpha = safe_div(s.rr, pap)
        x_new = s.x + alpha * s.p
        r_new = s.r - alpha * s.ap
        w = A.matvec(r_new)
        rr_new, rw = fused_dots([(r_new, r_new), (r_new, w)], axis_name)
        res = jnp.sqrt(rr_new)
        it = s.it + 1
        obj = s.obj - 0.5 * alpha * s.rr
        obj_done = (
            (obj <= obj_target) if obj_target is not None else jnp.asarray(False)
        )
        beta = safe_div(rr_new, s.rr)
        pap_new = rw - beta * beta * pap
        p_new = r_new + beta * s.p
        ap_new = w + beta * s.ap
        reached = (res <= threshold) & check_norm
        done = reached | indefinite | obj_done
        brk = jnp.where(
            indefinite, jnp.int32(Breakdown.INDEFINITE_MATRIX), s.breakdown
        )
        hist_new = push_history(s.hist, it, res)
        emit_monitor(monitor, it, res)
        return _CGCarry(
            x_new, r_new, p_new, ap_new, rr_new, pap_new, obj, it, res, done, brk, hist_new
        )

    body = body_single_reduction if single_reduction else body_standard
    final = lax.while_loop(cond, body, init)

    res_out = final.res
    if use_true_residual(true_residual, b.dtype):
        r_true = b - A.matvec(final.x)
        res_out = jnp.sqrt(dot(r_true, r_true, axis_name))
    stats = make_stats(
        final.it,
        res_out,
        safe_div(res_out, res0),
        (final.breakdown == Breakdown.NONE) & (res_out <= threshold) & check_norm,
        final.breakdown,
        maxiter,
        final.hist,
    )
    return final.x, stats


class _PCGCarry(NamedTuple):
    x: Array
    r: Array
    z: Array
    p: Array
    ap: Array
    rz: Array
    pap: Array
    it: Array
    res: Array
    done: Array
    breakdown: Array
    hist: Optional[Array]


def pcg(
    A,
    b,
    x0=None,
    *,
    M=None,
    tol: float = 1e-8,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    norm_type: NormType = NormType.UNPRECONDITIONED,
    single_reduction: bool = False,
    record_history: bool = False,
    monitor=None,
    axis_name: Optional[str] = None,
    true_residual: Optional[bool] = None,
):
    """Preconditioned CG (reference PcgSolver, pcg.rs; Saad §9.2).

    ``M`` is a preconditioner state with ``.apply(r) -> z`` (see
    kryst_tpu/pc/base.py), or None for identity.

    ``true_residual``: recompute the residual from x once after the loop
    (in the solver's ``norm_type``) and report stats from it; ``None``
    auto-enables below f64 (see :func:`cg`).
    """
    A = prepare_loop(as_operator(A, dtype=jnp.asarray(b).dtype))
    M = prepare_loop(M)
    b = jnp.asarray(b)
    x = default_x0(b, x0)
    n = b.shape[0]
    maxiter = n if maxiter is None else maxiter
    apply_M = (lambda r: r) if M is None else M.apply

    r = b - A.matvec(x)
    z = apply_M(r)
    rz0 = dot(r, z, axis_name)

    def measure(r_, z_, rz_):
        if norm_type == NormType.PRECONDITIONED:
            return jnp.sqrt(dot(z_, z_, axis_name))
        if norm_type == NormType.NATURAL:
            return jnp.sqrt(jnp.maximum(rz_, 0.0))
        return jnp.sqrt(dot(r_, r_, axis_name))

    res0 = measure(r, z, rz0)
    threshold = jnp.maximum(tol * res0, atol)
    check_norm = norm_type != NormType.NONE
    hist = init_history(maxiter, res0, record_history)

    if single_reduction:
        w = A.matvec(z)
        pap0 = dot(z, w, axis_name)
        init = _PCGCarry(
            x, r, z, z, w, rz0, pap0, jnp.int32(0), res0,
            (res0 <= threshold) & check_norm, jnp.int32(Breakdown.NONE), hist,
        )
    else:
        init = _PCGCarry(
            x, r, z, z, jnp.zeros_like(r), rz0, jnp.ones_like(rz0), jnp.int32(0),
            res0, (res0 <= threshold) & check_norm, jnp.int32(Breakdown.NONE), hist,
        )

    def cond(s: _PCGCarry):
        return (~s.done) & (s.it < maxiter)

    def body_standard(s: _PCGCarry) -> _PCGCarry:
        from kryst_tpu.ops.fused import cg_fused_update

        if hasattr(A, "matvec_dot") and axis_name is None:
            ap, pap = A.matvec_dot(s.p)  # fused SpMV + <p, Ap> (ops/fused.py)
        else:
            ap = A.matvec(s.p)
            pap = dot(s.p, ap, axis_name)
        indefinite = pap <= 0  # pcg.rs:162-172
        alpha = safe_div(s.rz, pap)
        x_new, r_new, _rr_local = cg_fused_update(s.x, s.p, s.r, ap, alpha)
        z_new = apply_M(r_new)
        rz_new = dot(r_new, z_new, axis_name)
        res = measure(r_new, z_new, rz_new)
        it = s.it + 1
        beta = safe_div(rz_new, s.rz)
        indefinite_pc = beta < 0  # pcg.rs:206-213
        p_new = z_new + beta * s.p
        reached = (res <= threshold) & check_norm
        done = reached | indefinite | indefinite_pc
        brk = jnp.where(
            indefinite,
            jnp.int32(Breakdown.INDEFINITE_MATRIX),
            jnp.where(
                indefinite_pc,
                jnp.int32(Breakdown.INDEFINITE_PRECONDITIONER),
                s.breakdown,
            ),
        )
        hist_new = push_history(s.hist, it, res)
        emit_monitor(monitor, it, res)
        return _PCGCarry(
            x_new, r_new, z_new, p_new, s.ap, rz_new, s.pap, it, res, done, brk, hist_new
        )

    def body_single_reduction(s: _PCGCarry) -> _PCGCarry:
        # Chronopoulos–Gear PCG: p^T A p = <z, Az> - beta^2 pap_old;
        # one fused (rz, zw) reduction per iteration (pcg.rs:151-160).
        pap = s.pap
        indefinite = pap <= 0
        alpha = safe_div(s.rz, pap)
        x_new = s.x + alpha * s.p
        r_new = s.r - alpha * s.ap
        z_new = apply_M(r_new)
        w = A.matvec(z_new)
        rz_new, zw = fused_dots([(r_new, z_new), (z_new, w)], axis_name)
        res = measure(r_new, z_new, rz_new)
        it = s.it + 1
        beta = safe_div(rz_new, s.rz)
        indefinite_pc = beta < 0
        pap_new = zw - beta * beta * pap
        p_new = z_new + beta * s.p
        ap_new = w + beta * s.ap
        reached = (res <= threshold) & check_norm
        done = reached | indefinite | indefinite_pc
        brk = jnp.where(
            indefinite,
            jnp.int32(Breakdown.INDEFINITE_MATRIX),
            jnp.where(
                indefinite_pc,
                jnp.int32(Breakdown.INDEFINITE_PRECONDITIONER),
                s.breakdown,
            ),
        )
        hist_new = push_history(s.hist, it, res)
        emit_monitor(monitor, it, res)
        return _PCGCarry(
            x_new, r_new, z_new, p_new, ap_new, rz_new, pap_new, it, res, done, brk, hist_new
        )

    body = body_single_reduction if single_reduction else body_standard
    final = lax.while_loop(cond, body, init)
    res_out = final.res
    if use_true_residual(true_residual, b.dtype):
        r_true = b - A.matvec(final.x)
        if norm_type in (NormType.PRECONDITIONED, NormType.NATURAL):
            z_true = apply_M(r_true)
            rz_true = dot(r_true, z_true, axis_name)
        else:
            z_true, rz_true = r_true, jnp.zeros_like(res0)
        res_out = measure(r_true, z_true, rz_true)
    stats = make_stats(
        final.it,
        res_out,
        safe_div(res_out, res0),
        (final.breakdown == Breakdown.NONE) & (res_out <= threshold) & check_norm,
        final.breakdown,
        maxiter,
        final.hist,
    )
    return final.x, stats
