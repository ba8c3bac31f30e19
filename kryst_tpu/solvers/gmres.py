"""Restarted GMRES(m) and flexible GMRES as fixed-shape while_loop kernels.

TPU-native redesign of the reference GmresSolver / FgmresSolver
(src/solver/gmres.rs, src/solver/fgmres.rs; Saad §6.4 / §9.4).

Design notes
------------
- The Krylov basis is a fixed ``(restart+1, n)`` row-major buffer — the
  jit-able analogue of the reference's ``preallocate`` policy
  (fgmres.rs:144-153). Orthogonalization against the first ``j`` rows is a
  *masked matmul panel* ``V @ w`` — on TPU this turns the reference's
  per-vector MGS dot loop (gmres.rs:83-96) into an MXU-shaped reduction.
- The reference performs MGS followed by an unconditional second pass
  (gmres.rs:83-96) — i.e. a twice-is-enough re-orthogonalization. Here the
  default is CGS2 (classical Gram-Schmidt, two passes), which has the same
  numerical quality and is one matmul per pass instead of j sequential
  dots; ``orthog="mgs2"`` gives a scan-based modified variant.
- Givens rotations and the triangular solve are O(restart²) scalar work,
  kept on device (gmres.rs:154-192); zero diagonal in the back-substitution
  sets the ZERO_PIVOT breakdown flag instead of erroring (gmres.rs:183-186).
- Happy breakdown at ``h[j+1,j] < 1e-14`` exits the cycle (gmres.rs:98-100).
- Left preconditioning runs Arnoldi on M⁻¹A and measures the preconditioned
  residual; right preconditioning runs on AM⁻¹ and applies M⁻¹ once to the
  correction ``V y`` — valid because preconditioners are linear, so the
  reference's stored z-basis (gmres.rs:308-342) is unnecessary for GMRES
  (FGMRES, whose M varies per iteration, does store Z).
- The true residual is recomputed at every restart boundary
  (gmres.rs:387-398).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array, lax

from kryst_tpu.core.convergence import Breakdown, make_stats
from kryst_tpu.core.linop import as_operator
from kryst_tpu.solvers._common import (
    default_x0,
    prepare_loop,
    dot,
    emit_monitor,
    init_history,
    safe_div,
)


# ---------------------------------------------------------------------------
# shared Arnoldi/Givens machinery
# ---------------------------------------------------------------------------

# Row-chunk size for active-prefix panels. A masked full-width matmul
# reads ALL restart+1 basis rows from HBM every Arnoldi step, so beyond
# VMEM residency each CGS2 step paid 4 x (m+1) x n x 4 B of traffic
# (measured 7.8 ms/iter at 8M dof, restart 30 — 2x the active-prefix
# traffic bound). Chunking the rows and skipping whole chunks past j with
# ``lax.cond`` (TPU conditionals execute only the taken branch) reads only
# ceil((j+1)/8)*8 rows: the average active width over a restart cycle is
# ~(m+1)/2, halving panel traffic at a cost of ~(m+1)/8 conditionals.
_PANEL_CHUNK = 8

# When the whole basis stays VMEM-resident across inner iterations the
# row traffic is free and the lax.switch costs real time instead of
# saving any (config-2 measured 93.9 us/iter chunked vs 38.9 full-width
# at 256^2, restart 30 — the switch forces a fresh panel materialization
# per step). Dispatch at trace time on the basis footprint, mirroring
# the DIAOperator residency policy (ops/dia.py `resident`): full-width
# masked matmul when V fits comfortably in the 128 MB v5e VMEM alongside
# the operator coefficients, chunked active-prefix beyond.
_PANEL_RESIDENT_BYTES = 48 * 1024 * 1024


def _panel_resident(V) -> bool:
    return V.size * V.dtype.itemsize <= _PANEL_RESIDENT_BYTES


def _active_chunks(j, mp1):
    """Switch index: number of active row chunks minus one, for row
    prefix 0..j."""
    nch = -(-mp1 // _PANEL_CHUNK)
    return jnp.minimum(j // _PANEL_CHUNK, nch - 1)


def _panel_dots(V, w, j, axis_name, extra=None):
    """h = (V @ w) masked to rows 0..j.

    VMEM-resident bases use ONE full-width matmul (row traffic is free;
    measured 38.9 us/GMRES-iter at 256^2); beyond-VMEM bases read only
    the active row chunks via ``_chunked_panel_dots``. ``extra`` (a
    scalar) rides the same reduction round; returns (h, extra_reduced)
    when given."""
    if not _panel_resident(V):
        return _chunked_panel_dots(V, w, j, axis_name, extra=extra)
    mp1 = V.shape[0]
    h = V @ w
    if extra is not None:
        h = jnp.concatenate([h, extra[None]])
    if axis_name is not None:
        h = lax.psum(h, axis_name)
    hm = h[:mp1] * (jnp.arange(mp1) <= j).astype(V.dtype)
    return (hm, h[mp1]) if extra is not None else hm


def _panel_correction(V, h, j, axis_name=None):
    """w_corr = h @ V; rows past j contribute zero (h is masked).

    Full-width on VMEM-resident bases, active-prefix chunks beyond."""
    if not _panel_resident(V):
        return _chunked_correction(V, h, j, axis_name)
    return h @ V


def _chunked_panel_dots(V, w, j, axis_name, extra=None):
    """h = (V @ w) masked to rows 0..j, reading only the row chunks that
    intersect the active prefix: ONE ``lax.switch`` whose branch k does
    the (8(k+1), n) prefix matmul, with the slice taken INSIDE the branch
    so it fuses into the read (a slice captured as a branch operand
    materializes a copy — measured slower than the full-width matmul).
    ``extra`` (a scalar) rides the same reduction round; returns
    (h, extra_reduced) when given."""
    mp1 = V.shape[0]

    def mk(k):
        rows = min((k + 1) * _PANEL_CHUNK, mp1)

        def br():
            return jnp.pad(V[:rows] @ w, (0, mp1 - rows))

        return br

    nch = -(-mp1 // _PANEL_CHUNK)
    h = lax.switch(_active_chunks(j, mp1), [mk(k) for k in range(nch)])
    if extra is not None:
        h = jnp.concatenate([h, extra[None]])
    if axis_name is not None:
        h = lax.psum(h, axis_name)
    hm = h[:mp1] * (jnp.arange(mp1) <= j).astype(V.dtype)
    return (hm, h[mp1]) if extra is not None else hm


def _chunked_correction(V, h, j, axis_name=None):
    """w_corr = h @ V over the active prefix: rows past j are skipped
    (their h entries are already masked to zero)."""
    mp1 = V.shape[0]

    def mk(k):
        rows = min((k + 1) * _PANEL_CHUNK, mp1)

        def br():
            return h[:rows] @ V[:rows]

        return br

    nch = -(-mp1 // _PANEL_CHUNK)
    return lax.switch(_active_chunks(j, mp1), [mk(k) for k in range(nch)])


def _orthogonalize_cgs2(V, w, j, axis_name=None):
    """Two-pass classical Gram-Schmidt of w against rows 0..j of V.

    Returns (w_orth, h) where h has length nrows(V); entries > j are 0.
    Each pass is ONE active-prefix panel + ONE correction — the
    comm-avoiding shape (a single fused reduction per pass on a mesh).
    """
    h1 = _panel_dots(V, w, j, axis_name)
    w = w - _panel_correction(V, h1, j, axis_name)
    h2 = _panel_dots(V, w, j, axis_name)
    w = w - _panel_correction(V, h2, j, axis_name)
    return w, h1 + h2


def _orthogonalize_cgs(V, w, j, axis_name=None):
    """Single-pass classical Gram-Schmidt (reference ``Orthog::Classical``,
    fgmres.rs:217-224): half the panel cost of CGS2, adequate for
    well-conditioned bases."""
    h1 = _panel_dots(V, w, j, axis_name)
    return w - _panel_correction(V, h1, j, axis_name), h1


def _orthogonalize_cgs_adaptive(V, w, j, axis_name=None, eta=0.5):
    """CGS with a CONDITIONAL second pass (reference fgmres.rs:217-247
    re-orthogonalizes only when the correction is significant).

    By Pythagoras ||w_orth||^2 = ||w||^2 - ||h1||^2, so the selective
    re-orthogonalization criterion ||w_orth||^2 < eta * ||w||^2
    (Rutishauser; eta = 1/2) costs one extra scalar reduction fused into
    the panel psum. The second panel runs inside ``lax.cond`` — skipped
    entirely when the basis is clean, which on TPU removes the dominant
    GMRES panel cost in the common case.
    """
    # <w,w> rides the same reduction round as the panel dots
    h1, ww = _panel_dots(V, w, j, axis_name, extra=jnp.dot(w, w))
    w1 = w - _panel_correction(V, h1, j, axis_name)
    drop = ww - h1 @ h1  # = ||w1||^2 up to roundoff
    need_second = drop < eta * ww

    def second(args):
        w1, h1 = args
        h2 = _panel_dots(V, w1, j, axis_name)
        return w1 - _panel_correction(V, h2, j, axis_name), h1 + h2

    def keep(args):
        return args

    return lax.cond(need_second, second, keep, (w1, h1))


_ORTHOGONALIZERS = {
    "cgs2": _orthogonalize_cgs2,
    "mgs2": None,  # filled below (defined next)
    "classical": _orthogonalize_cgs,
    "cgs": _orthogonalize_cgs,
    "adaptive": _orthogonalize_cgs_adaptive,
}


def _orthogonalize_mgs2(V, w, j, axis_name=None):
    """Modified Gram-Schmidt (sequential) + second pass (gmres.rs:83-96)."""
    mp1 = V.shape[0]

    def pass_(w):
        def body(i, carry):
            w, h = carry
            active = i <= j
            hi = dot(V[i], w, axis_name)
            hi = jnp.where(active, hi, 0.0)
            w = w - hi * V[i]
            h = h.at[i].set(hi)
            return (w, h)

        return lax.fori_loop(0, mp1, body, (w, jnp.zeros(mp1, dtype=V.dtype)))

    w, h1 = pass_(w)
    w, h2 = pass_(w)
    return w, h1 + h2


_ORTHOGONALIZERS["mgs2"] = _orthogonalize_mgs2


def _apply_stored_givens(h, cs, sn, j):
    """Apply rotations 0..j-1 to the new column h (gmres.rs:154-176).

    The rotation chain is a first-order affine recurrence on the running
    value v_i (the partially-rotated h_i):

        v_0 = h_0;   v_{i+1} = (-s_i) v_i + c_i h_{i+1}
        out_i = c_i v_i + s_i h_{i+1}          (for i < j)

    evaluated with ``lax.associative_scan`` in O(log m) vector steps —
    the sequential fori_loop version cost ~3 launch-bound scalar ops per
    rotation (~2.3 ms per Arnoldi step at restart 30 on this TPU).
    Inactive rotations (i >= j) use the identity (c=1, s=0), which makes
    v_{i+1} = h_{i+1}, so untouched entries pass through unchanged.
    """
    m = cs.shape[0]
    active = jnp.arange(m) < j
    c = jnp.where(active, cs, 1.0)
    s = jnp.where(active, sn, 0.0)
    a = -s
    b = c * h[1:]

    def comb(x, y):
        return (y[0] * x[0], y[0] * x[1] + y[1])

    A_, B_ = lax.associative_scan(comb, (a, b))
    v = jnp.concatenate([h[:1], A_ * h[0] + B_])  # v_i, i = 0..m
    rot = c * v[:m] + s * h[1:]
    idx = jnp.arange(m + 1)
    return jnp.where(idx < j, jnp.concatenate([rot, v[-1:]]), v)


def _new_givens(a, b):
    """Rotation zeroing b: returns (c, s, r) with c*a + s*b = r."""
    denom = jnp.sqrt(a * a + b * b)
    c = jnp.where(denom > 0, a / jnp.where(denom > 0, denom, 1.0), 1.0)
    s = jnp.where(denom > 0, b / jnp.where(denom > 0, denom, 1.0), 0.0)
    return c, s, denom


def _solve_upper(Ht, g, j_end):
    """Solve the active (j_end x j_end) upper-triangular block H y = g.

    Ht is the transposed Hessenberg buffer: Ht[k] = column k of H,
    shape (m, m+1). Inactive rows/cols are replaced by the identity so one
    fixed-shape triangular solve handles every j_end (gmres.rs:180-192).
    Returns (y, zero_pivot).
    """
    m = Ht.shape[0]
    U = Ht[:, :m].T  # (m, m): U[i, k] = H[i, k]
    ij = jnp.arange(m)
    active2d = (ij[:, None] < j_end) & (ij[None, :] < j_end)
    eye = jnp.eye(m, dtype=U.dtype)
    Umod = jnp.where(active2d, U, eye)
    gmod = jnp.where(ij < j_end, g[:m], 0.0)
    diag = jnp.diagonal(Umod)
    zero_pivot = jnp.any((jnp.abs(diag) == 0) & (ij < j_end))
    Umod = Umod + jnp.where(diag == 0, 1.0, 0.0)[None, :] * eye
    y = jax.scipy.linalg.solve_triangular(Umod, gmod, lower=False)
    return y, zero_pivot


# ---------------------------------------------------------------------------
# GMRES
# ---------------------------------------------------------------------------

class _InnerCarry(NamedTuple):
    V: Array
    Ht: Array
    g: Array
    cs: Array
    sn: Array
    j: Array
    res_est: Array
    active: Array
    happy: Array
    hist: Optional[Array]


class _OuterCarry(NamedTuple):
    x: Array
    it: Array
    res: Array
    done: Array
    breakdown: Array
    hist: Optional[Array]


def gmres(
    A,
    b,
    x0=None,
    *,
    M=None,
    side: str = "left",
    tol: float = 1e-8,
    atol: float = 0.0,
    maxiter: int = 1000,
    restart: int = 30,
    orthog: str = "cgs2",
    happy_tol: float = 1e-14,
    record_history: bool = False,
    axis_name: Optional[str] = None,
):
    """Restarted GMRES(m) with optional left/right preconditioning.

    ``side``: "left" (default, gmres.rs:53), "right", or "none".
    Returns ``(x, SolveStats)``.
    """
    if side not in ("left", "right", "none"):
        raise ValueError(f"side must be left/right/none, got {side!r}")
    A = prepare_loop(as_operator(A, dtype=jnp.asarray(b).dtype))
    M = prepare_loop(M) if not callable(M) else M
    b = jnp.asarray(b)
    x = default_x0(b, x0)
    n = b.shape[0]
    m = restart
    apply_M = (lambda v: v) if M is None else M.apply
    if M is None:
        side = "none"
    if orthog not in _ORTHOGONALIZERS:
        raise ValueError(
            f"orthog must be one of {sorted(_ORTHOGONALIZERS)}, got {orthog!r}"
        )
    orth = _ORTHOGONALIZERS[orthog]

    def residual(x):
        r = b - A.matvec(x)
        if side == "left":
            r = apply_M(r)
        return r

    def op(v):
        if side == "left":
            return apply_M(A.matvec(v))
        if side == "right":
            return A.matvec(apply_M(v))
        return A.matvec(v)

    r0 = residual(x)
    res0 = jnp.sqrt(dot(r0, r0, axis_name))
    threshold = jnp.maximum(tol * res0, atol)
    hist0 = init_history(maxiter, res0, record_history)
    dtype = b.dtype

    def outer_body(s: _OuterCarry) -> _OuterCarry:
        r = residual(s.x)
        beta = jnp.sqrt(dot(r, r, axis_name))
        V0 = jnp.zeros((m + 1, n), dtype=dtype)
        V0 = V0.at[0].set(safe_div(r, beta))
        inner0 = _InnerCarry(
            V=V0,
            Ht=jnp.zeros((m, m + 1), dtype=dtype),
            g=jnp.zeros(m + 1, dtype=dtype).at[0].set(beta),
            cs=jnp.zeros(m, dtype=dtype),
            sn=jnp.zeros(m, dtype=dtype),
            j=jnp.int32(0),
            res_est=beta,
            active=beta > threshold,
            happy=jnp.asarray(False),
            hist=s.hist,
        )

        def inner_cond(c: _InnerCarry):
            return c.active & (c.j < m) & (s.it + c.j < maxiter)

        def inner_body(c: _InnerCarry) -> _InnerCarry:
            vj = c.V[c.j]
            w = op(vj)
            w, h = orth(c.V, w, c.j, axis_name)
            hnorm = jnp.sqrt(dot(w, w, axis_name))
            happy = hnorm < happy_tol  # gmres.rs:98-100
            vnext = safe_div(w, hnorm)
            V = lax.dynamic_update_index_in_dim(c.V, vnext, c.j + 1, 0)
            h = h.at[c.j + 1].set(hnorm)
            # Givens: rotate the new column, then generate rotation j
            h = _apply_stored_givens(h, c.cs, c.sn, c.j)
            cj, sj, rj = _new_givens(h[c.j], h[c.j + 1])
            h = h.at[c.j].set(rj).at[c.j + 1].set(0.0)
            cs = c.cs.at[c.j].set(cj)
            sn = c.sn.at[c.j].set(sj)
            gj = c.g[c.j]
            g = c.g.at[c.j].set(cj * gj).at[c.j + 1].set(-sj * gj)
            Ht = lax.dynamic_update_index_in_dim(c.Ht, h, c.j, 0)
            res_est = jnp.abs(g[c.j + 1])
            j = c.j + 1
            hist = (
                None
                if c.hist is None
                else c.hist.at[jnp.minimum(s.it + j, maxiter)].set(res_est)
            )
            active = (res_est > threshold) & (~happy)
            return _InnerCarry(V, Ht, g, cs, sn, j, res_est, active, happy, hist)

        f = lax.while_loop(inner_cond, inner_body, inner0)
        j_end = f.j
        y, zero_pivot = _solve_upper(f.Ht, f.g, j_end)
        # correction = sum_k y_k v_k over the active columns
        colmask = (jnp.arange(m) < j_end).astype(dtype)
        update = (y * colmask) @ f.V[:m]
        if side == "right":
            update = apply_M(update)
        x_new = s.x + update

        # true residual at the restart boundary (gmres.rs:387-398)
        r_true = b - A.matvec(x_new)
        if side == "left":
            z_true = apply_M(r_true)  # bind once: heavy PCs (AMG/GMG) may not CSE
            res_meas = jnp.sqrt(dot(z_true, z_true, axis_name))
        else:
            res_meas = jnp.sqrt(dot(r_true, r_true, axis_name))
        it = s.it + j_end
        reached = res_meas <= threshold
        brk = jnp.where(zero_pivot, jnp.int32(Breakdown.ZERO_PIVOT), s.breakdown)
        # a happy breakdown with the subspace solved exactly is convergence
        done = reached | zero_pivot | f.happy | (j_end == 0) | (it >= maxiter)
        return _OuterCarry(x_new, it, res_meas, done, brk, f.hist)

    init = _OuterCarry(
        x,
        jnp.int32(0),
        res0,
        res0 <= threshold,
        jnp.int32(Breakdown.NONE),
        hist0,
    )
    final = lax.while_loop(lambda s: (~s.done) & (s.it < maxiter), outer_body, init)
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


# ---------------------------------------------------------------------------
# FGMRES
# ---------------------------------------------------------------------------

class _FInnerCarry(NamedTuple):
    V: Array
    Z: Array
    Ht: Array
    g: Array
    cs: Array
    sn: Array
    j: Array
    res_est: Array
    active: Array
    happy: Array
    hist: Optional[Array]


def fgmres(
    A,
    b,
    x0=None,
    *,
    M=None,
    tol: float = 1e-8,
    atol: float = 0.0,
    maxiter: int = 1000,
    restart: int = 30,
    orthog: str = "cgs2",
    happy_tol: float = 1e-12,
    record_history: bool = False,
    monitor=None,
    axis_name: Optional[str] = None,
):
    """Flexible GMRES (reference FgmresSolver, fgmres.rs; Saad §9.4).

    ``M`` may be a preconditioner state (``.apply``) or a *flexible*
    callable ``(iteration, v) -> z`` whose behavior varies with the
    iteration index — the jit-able analogue of the reference's
    ``FlexiblePreconditioner`` + ``modify_pc`` callback (fgmres.rs:44-46).
    The z-basis is stored explicitly (fgmres.rs:207-211) since a varying M
    admits no recomputation trick.
    """
    A = prepare_loop(as_operator(A, dtype=jnp.asarray(b).dtype))
    M = prepare_loop(M) if not callable(M) else M
    b = jnp.asarray(b)
    x = default_x0(b, x0)
    n = b.shape[0]
    m = restart
    if M is None:
        apply_M = lambda it, v: v
    elif callable(M) and not hasattr(M, "apply"):
        apply_M = M
    else:
        apply_M = lambda it, v: M.apply(v)
    if orthog not in _ORTHOGONALIZERS:
        raise ValueError(
            f"orthog must be one of {sorted(_ORTHOGONALIZERS)}, got {orthog!r}"
        )
    orth = _ORTHOGONALIZERS[orthog]

    r0 = b - A.matvec(x)
    res0 = jnp.sqrt(dot(r0, r0, axis_name))
    threshold = jnp.maximum(tol * res0, atol)
    hist0 = init_history(maxiter, res0, record_history)
    dtype = b.dtype

    def outer_body(s: _OuterCarry) -> _OuterCarry:
        r = b - A.matvec(s.x)
        beta = jnp.sqrt(dot(r, r, axis_name))
        V0 = jnp.zeros((m + 1, n), dtype=dtype).at[0].set(safe_div(r, beta))
        inner0 = _FInnerCarry(
            V=V0,
            Z=jnp.zeros((m, n), dtype=dtype),
            Ht=jnp.zeros((m, m + 1), dtype=dtype),
            g=jnp.zeros(m + 1, dtype=dtype).at[0].set(beta),
            cs=jnp.zeros(m, dtype=dtype),
            sn=jnp.zeros(m, dtype=dtype),
            j=jnp.int32(0),
            res_est=beta,
            active=beta > threshold,
            happy=jnp.asarray(False),
            hist=s.hist,
        )

        def inner_cond(c: _FInnerCarry):
            return c.active & (c.j < m) & (s.it + c.j < maxiter)

        def inner_body(c: _FInnerCarry) -> _FInnerCarry:
            vj = c.V[c.j]
            z = apply_M(s.it + c.j, vj)  # flexible: may depend on iteration
            Z = lax.dynamic_update_index_in_dim(c.Z, z, c.j, 0)
            w = A.matvec(z)
            w, h = orth(c.V, w, c.j, axis_name)
            hnorm = jnp.sqrt(dot(w, w, axis_name))
            # haptol scaled by the current residual estimate (fgmres.rs:251-259)
            happy = hnorm < happy_tol * jnp.maximum(c.res_est, 1.0)
            vnext = safe_div(w, hnorm)
            V = lax.dynamic_update_index_in_dim(c.V, vnext, c.j + 1, 0)
            h = h.at[c.j + 1].set(hnorm)
            h = _apply_stored_givens(h, c.cs, c.sn, c.j)
            cj, sj, rj = _new_givens(h[c.j], h[c.j + 1])
            h = h.at[c.j].set(rj).at[c.j + 1].set(0.0)
            cs = c.cs.at[c.j].set(cj)
            sn = c.sn.at[c.j].set(sj)
            gj = c.g[c.j]
            g = c.g.at[c.j].set(cj * gj).at[c.j + 1].set(-sj * gj)
            Ht = lax.dynamic_update_index_in_dim(c.Ht, h, c.j, 0)
            res_est = jnp.abs(g[c.j + 1])
            j = c.j + 1
            hist = (
                None
                if c.hist is None
                else c.hist.at[jnp.minimum(s.it + j, maxiter)].set(res_est)
            )
            emit_monitor(monitor, s.it + j, res_est)
            active = (res_est > threshold) & (~happy)
            return _FInnerCarry(V, Z, Ht, g, cs, sn, j, res_est, active, happy, hist)

        f = lax.while_loop(inner_cond, inner_body, inner0)
        j_end = f.j
        y, zero_pivot = _solve_upper(f.Ht, f.g, j_end)
        colmask = (jnp.arange(m) < j_end).astype(dtype)
        x_new = s.x + (y * colmask) @ f.Z

        r_true = b - A.matvec(x_new)
        res_true = jnp.sqrt(dot(r_true, r_true, axis_name))
        it = s.it + j_end
        reached = res_true <= threshold
        brk = jnp.where(zero_pivot, jnp.int32(Breakdown.ZERO_PIVOT), s.breakdown)
        done = reached | zero_pivot | f.happy | (j_end == 0) | (it >= maxiter)
        return _OuterCarry(x_new, it, res_true, done, brk, f.hist)

    init = _OuterCarry(
        x,
        jnp.int32(0),
        res0,
        res0 <= threshold,
        jnp.int32(Breakdown.NONE),
        hist0,
    )
    final = lax.while_loop(lambda s: (~s.done) & (s.it < maxiter), outer_body, init)
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
