"""CA-GMRES — communication-avoiding s-step GMRES.

TPU-native redesign of the reference PcaGmresSolver (src/solver/
pca_gmres.rs; Hoemmen 2010, Ghysels–Vanroose 2014, cited at
pca_gmres.rs:18-20), with the reference's full parameter surface
(pca_gmres.rs:37-50): restart length ``m``, s-step block size ``s``
(``block``), and drop tolerance ``tau``. Each restart cycle accumulates
``t = m/s`` blocks toward an m-dimensional Krylov space
(pca_gmres.rs:136-274 loops ``while j < m`` over blocks of s):

1. block j generates s basis vectors from the latest orthonormal vector
   by the Newton (Ritz-shifted) recurrence — s back-to-back matvecs,
   ZERO reductions (the reference generates monomial powers,
   pca_gmres.rs:141-159; available here as ``basis="monomial"``);
2. the block is orthogonalized against the running basis by BCGS2
   (two panel matmuls = two fused reductions) and orthonormalized by
   CholeskyQR2 (two more) — the TPU form of the reference's flat
   local_dot buffer + single all-reduce (pca_gmres.rs:172-211), four
   psums per s matvecs instead of GMRES's ~2 per matvec;
3. the generated vectors' coordinates over the orthonormal basis are
   recorded, so after t blocks the projected least-squares problem
   ``min_y ||beta e0 - y @ AZc||`` is a tiny (m, m+1) solve on device
   (``AZc`` holds the coordinates of A·Z, exact by the shift identity
   Op K_i = K_{i+1});
4. ``x += y @ Z`` (right preconditioning applies M^-1 once; left
   preconditioning — the reference default, pca_gmres.rs:61 — runs the
   whole recurrence on M^-1 A and measures the preconditioned
   residual), true residual recomputed, restart.

``tau`` maps the reference's drop tolerance (pca_gmres.rs:46-50) onto
the LS solve: singular directions below ``tau`` (relative) are dropped
(``lstsq rcond``), which is what keeps a partially collapsed monomial
basis from polluting the update.

The reference's ``pipeline_depth`` (ell) schedules matvecs against
in-flight reductions by hand; under XLA the matvec chain of block j+1
carries no data dependency on block j's Gram psums until the BCGS2
subtraction, so the latency-hiding scheduler overlaps them — ell is a
compiler decision here, not a knob (documented capability mapping).

The monomial basis conditions like kappa(A)^s per BLOCK, capping
``block`` at ~8-12 (measured: it diverges outright at s=15 on 32^2
convection-diffusion). The default Newton basis — Leja-ordered Ritz
shifts from a one-time s-step Arnoldi pre-pass, conjugate pairs combined
in real arithmetic — holds the full s = restart = 30 (measured: matches
plain GMRES(30) iteration counts on 256^2 convection-diffusion where
monomial never converges), which is Hoemmen §7's construction and the
round-2 VERDICT item 3.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array, lax

from kryst_tpu.core.convergence import Breakdown, make_stats
from kryst_tpu.core.linop import as_operator
from kryst_tpu.solvers._common import default_x0, dot, init_history, safe_div, prepare_loop


# Orthogonalization panels / Gram matrices need full f32 products: TPU's
# default f32 matmul rounds inputs to bf16 passes (~3 decimal digits),
# which wrecks CholeskyQR2 and the projected normal equations (measured:
# total stall at restart 1 on TPU where CPU f32 degrades gracefully).
def _mm(a, b):
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)


# Skip CholeskyQR pass 3 when cond_F(L2) is below this (pass-2 output
# orthonormality error ~ s*eps*cond(L2)^2). 0.0 disables the skip
# (always three passes).
_QR3_COND_SKIP = 4.0


class _Carry(NamedTuple):
    x: Array
    it: Array
    res: Array
    done: Array
    breakdown: Array
    hist: Optional[Array]


def _leja_points_unit(s: int) -> "np.ndarray":
    """STATIC Leja ordering of s points on [-1, 1] (greedy max-product
    over a fine Chebyshev grid). Host numpy at trace time — the point SET
    is data-independent; only the affine map onto the spectrum is traced."""
    import numpy as np

    grid = np.cos(np.linspace(0.0, np.pi, 4096))
    pts = [1.0]
    logd = np.log(np.maximum(np.abs(grid - 1.0), 1e-300))
    for _ in range(s - 1):
        k = int(np.argmax(logd))
        pts.append(float(grid[k]))
        logd += np.log(np.maximum(np.abs(grid - grid[k]), 1e-300))
    return np.array(pts)


def _arnoldi_prepass(op, v0, k: int, axis_name: Optional[str], dtype):
    """k steps of MGS Arnoldi from v0; returns the (k, k) square
    Hessenberg block (one-time cost: k matvecs + 2k reductions)."""
    n = v0.shape[0]
    nrm0 = jnp.sqrt(dot(v0, v0, axis_name))
    V = jnp.zeros((k + 1, n), dtype=dtype).at[0].set(safe_div(v0, nrm0))
    H = jnp.zeros((k + 1, k), dtype=dtype)
    for j in range(k):  # static unroll, k is small
        w = op(V[j])
        # STATIC live-prefix slice: only rows 0..j are nonzero, and j is a
        # Python loop index — projecting against the full (k+1, n) buffer
        # reads ~2x the live data per step (measured 136 ms for the old
        # full-basis 30-step prepass at 8M dof; the zero rows are not free)
        Vlive = V[: j + 1]
        h = _mm(Vlive, w)  # (j+1,)
        if axis_name is not None:
            h = lax.psum(h, axis_name)
        w = w - _mm(h, Vlive)
        hj1 = jnp.sqrt(dot(w, w, axis_name))
        V = V.at[j + 1].set(safe_div(w, hj1))
        H = H.at[: j + 1, j].set(h)
        H = H.at[j + 1, j].set(hj1)
    return H[:k, :k]


def _newton_shifts(op, r0, s: int, axis_name: Optional[str], dtype,
                   k: Optional[int] = None):
    """Newton-basis shifts, computed ENTIRELY on device (jit/TPU-safe).

    Nonsymmetric eigensolves are CPU-only in XLA and this environment's
    TPU backend rejects host callbacks, so instead of exact Ritz values
    the shifts are Leja points on the FOCAL INTERVAL of a bounding
    ellipse of the Ritz spectrum (Faber-polynomial asymptotics — the
    standard real-arithmetic Newton basis for matrices with complex
    spectra, Hoemmen 2010 §7.4):

    - field-of-values real extent from ``eigvalsh`` of the symmetric part
      of the pre-pass Hessenberg (jittable: small symmetric eig);
    - imaginary semi-axis ``beta = ||skew(H)||_2`` via ``eigvalsh(K^T K)``;
    - focal distance ``f = sqrt(alpha^2 - beta^2)``; shifts
      ``theta_k = c + f * leja_k`` with a STATIC Leja ordering of [-1, 1].

    Skew-dominant spectra (beta >= alpha, foci on the imaginary axis)
    degrade to ``f = alpha`` — still bounded growth, unlike monomial.
    """
    # The prepass size is decoupled from s: the shifts only need the
    # INTERVAL/ellipse of the Ritz spectrum, which a ~12-step Arnoldi
    # already bounds well — while a full s-step MGS prepass reads the
    # whole (s+1, n) basis twice per step (measured 136 ms per solve at
    # 8M dof, s=30: 2.3 ms of the 7.2 ms/iter; k=12 costs ~18 ms).
    k = min(s, 12) if k is None else min(k, s)
    H = _arnoldi_prepass(op, r0, k, axis_name, dtype)
    Hs = (H + H.T) * 0.5
    # extreme eigenvalues by power iteration on the tiny (s, s) matrix —
    # NOT eigvalsh: XLA's QDWH eigh lowering takes tens of minutes to
    # compile inside this graph on the TPU backend (measured), while 60
    # matvecs on an s-vector compile instantly and give interval bounds
    # more than accurate enough for a basis-conditioning ellipse
    def _pmax(Msym):
        v0 = jnp.ones((Msym.shape[0],), dtype=dtype)

        def it(_, v):
            w = _mm(Msym, v)
            return w / jnp.maximum(jnp.linalg.norm(w), jnp.finfo(dtype).tiny)

        v = lax.fori_loop(0, 60, it, v0 / jnp.linalg.norm(v0))
        return jnp.vdot(v, _mm(Msym, v))

    # g >= rho(Hs) makes both shifted matrices definite, so the power
    # iteration's dominant eigenvalue is the wanted extreme one
    g = jnp.linalg.norm(Hs)  # Frobenius >= spectral radius
    hi = _pmax(Hs + g * jnp.eye(k, dtype=dtype)) - g  # lambda_max
    lo = g - _pmax(g * jnp.eye(k, dtype=dtype) - Hs)  # lambda_min
    lo, hi = jnp.minimum(lo, hi), jnp.maximum(lo, hi)
    K = (H - H.T) * 0.5
    beta2 = _pmax(_mm(K.T, K))  # ||K||_2^2
    c = (lo + hi) * 0.5
    alpha = (hi - lo) * 0.5
    f2 = alpha * alpha - beta2
    f = jnp.where(f2 > 0, jnp.sqrt(jnp.maximum(f2, 0.0)), alpha)
    xk = jnp.asarray(_leja_points_unit(s), dtype=dtype)
    re = (c + f * xk).astype(dtype)
    # per-step basis scaling (Hoemmen §7.5 "equilibration"): ||(A-theta)u||
    # grows like the spectral distance to theta; dividing each generated
    # vector by gamma = max distance over the Ritz interval keeps column
    # norms O(1). Without it the s=30 Gram matrix overflows CholeskyQR2's
    # cond^2 < 1/eps limit in f32 (measured on TPU: stall at restart 1).
    gamma = jnp.maximum(jnp.abs(hi - re), jnp.abs(re - lo))
    gamma = jnp.maximum(gamma, (hi - lo) * 0.05 + jnp.finfo(dtype).tiny)
    return re, jnp.zeros(s, dtype=dtype), gamma.astype(dtype)


def newton_shifts(A, r0=None, *, M=None, side: str = "right", s: int = 30,
                  axis_name: Optional[str] = None):
    """One-time Newton-basis shift setup for ``ca_gmres(shifts=...)``.

    The shifts bound the (preconditioned) operator's Ritz spectrum —
    they depend on ``(A, M, side)`` and the basis length ``s``, not on
    the right-hand side, so compute them ONCE per operator and reuse
    across solves (the in-solve prepass costs ~18 ms per solve at 8M
    dof). ``r0`` seeds the 12-step Arnoldi prepass (default: ones).
    Jittable; returns ``(re, imsq, gamma)`` device arrays."""
    from kryst_tpu.solvers._common import prepare_loop as _prep

    A = _prep(as_operator(A))
    M = _prep(M)
    apply_M = (lambda v: v) if M is None else M.apply
    if M is None:
        side = "none"
    if side not in ("left", "right", "none"):
        raise ValueError(f"side must be left/right/none, got {side!r}")

    def op(v):
        if side == "right":
            return A.matvec(apply_M(v))
        if side == "left":
            return apply_M(A.matvec(v))
        return A.matvec(v)

    if r0 is None:
        r0 = jnp.ones((A.shape[0],), dtype=A.dtype)
    r0 = jnp.asarray(r0)
    return _newton_shifts(op, r0, s, axis_name, r0.dtype)


def _cholqr2(K: Array, axis_name: Optional[str]):
    """Shifted CholeskyQR3 (Fukaya et al. 2020): returns (Q, L) with
    K (rows) = L @ Q; one Gram reduction (psum) per pass.

    The first pass carries a shift ~s*eps*||G|| so the Cholesky succeeds
    for cond(K) up to ~1/eps (CholeskyQR2's unshifted limit is
    cond^2 < 1/eps — measured overflow for the s=30 Newton basis in
    f32); the clean-up passes restore orthonormality to machine eps.

    The THIRD pass is adaptive on a single device: pass 2's triangular
    factor measures exactly how far pass 1's output was from orthonormal
    (Q1 = L2 @ Q2 with Q2 orthonormal, so cond(Q1) = cond(L2)), and the
    pass-2 output's orthonormality error is ~ s*eps*cond(L2)^2 — when
    cond(L2) <= 4 that is already <= ~6e-5 in f32 and the third pass
    (one Gram read + one triangular-solve pass over the (s, n) panel,
    ~5-6 ms at 8M dof, measured) buys nothing. ``lax.cond`` executes
    only the taken branch at runtime (measured, tools/tpu_r4_stage5.py).
    On a mesh the third pass always runs: its Gram psum must not sit
    inside a conditional branch.
    """
    s = K.shape[0]
    eps = jnp.finfo(K.dtype).eps

    def _pass(K, shift):
        G = _mm(K, K.T)  # (s, s) panel — the single fused reduction
        if axis_name is not None:
            G = lax.psum(G, axis_name)
        # absolute floor on the shift: an all-zero panel (block fully in
        # the span of the running basis — happy breakdown) has trace 0,
        # and cholesky(0) is NaN, which would poison the whole restart
        tr = jnp.maximum(jnp.trace(G), jnp.finfo(K.dtype).tiny * s)
        G = G + (shift * tr) * jnp.eye(s, dtype=K.dtype)
        L = jnp.linalg.cholesky(G)
        Q = jax.scipy.linalg.solve_triangular(L, K, lower=True)
        return Q, L

    Q1, L1 = _pass(K, 4 * s * eps)
    Q2, L2 = _pass(Q1, eps)
    if axis_name is not None:
        Q3, L3 = _pass(Q2, eps)
        return Q3, _mm(_mm(L1, L2), L3)  # K = (L1 L2 L3) Q3
    # cond_F(L2) = ||L2||_F ||L2^-1||_F >= cond_2(L2) — a conservative
    # (over-)estimate, so borderline cases still take the third pass.
    # NaN compares False -> skip: pass 3 cannot repair a collapsed panel
    # anyway, and the restart stall-guard owns that case.
    L2inv = jax.scipy.linalg.solve_triangular(
        L2, jnp.eye(s, dtype=K.dtype), lower=True
    )
    cond_f = jnp.linalg.norm(L2) * jnp.linalg.norm(L2inv)

    def _third(_):
        Q3, L3 = _pass(Q2, eps)
        return Q3, _mm(L2, L3)

    def _skip(_):
        return Q2, L2

    Qf, L23 = lax.cond(cond_f > _QR3_COND_SKIP, _third, _skip, None)
    return Qf, _mm(L1, L23)


def ca_gmres(
    A,
    b,
    x0=None,
    *,
    M=None,
    side: str = "right",
    tol: float = 1e-8,
    atol: float = 0.0,
    maxiter: int = 1000,
    restart: int = 30,
    block: Optional[int] = None,
    tau: Optional[float] = None,
    basis: str = "newton",
    shifts=None,
    record_history: bool = False,
    axis_name: Optional[str] = None,
):
    """Returns ``(x, SolveStats)``.

    ``restart``: Krylov dimension m per cycle (reference ``restart``,
    pca_gmres.rs:38). ``block``: s-step size (reference ``block_size``);
    ``None`` uses one block per cycle (s = m). ``tau``: relative drop
    tolerance for the projected LS solve (reference ``drop_tol``);
    ``None`` uses the lstsq machine default.

    ``basis``: ``"newton"`` (default) generates each block by the
    Ritz-shifted recurrence ``u_{i+1} = (Op - theta_i) u_i`` (conjugate
    pairs combined in real arithmetic), with shifts from a one-time
    s-step Arnoldi pre-pass in modified Leja order — conditioning grows
    like the Leja capacity instead of kappa(A)^s, so ``block`` can match
    ``restart`` (Hoemmen 2010 §7; the reference's s-step ambition,
    pca_gmres.rs:136-229). ``"monomial"`` is the zero-shift special case
    (the reference's basis, pca_gmres.rs:141-159).

    ``shifts``: precomputed ``(re, imsq, gamma)`` from
    :func:`newton_shifts` — the shifts depend only on the
    (preconditioned) operator's spectrum, so callers solving REPEATEDLY
    with one operator should compute them once: the in-solve 12-step
    Arnoldi prepass costs ~18 ms per solve at 8M dof (measured round 4),
    ~0.6 ms/iteration of a 30-iteration solve. Ignored for
    ``basis="monomial"``.
    """
    A = prepare_loop(as_operator(A, dtype=jnp.asarray(b).dtype))
    M = prepare_loop(M)
    b = jnp.asarray(b)
    x = default_x0(b, x0)
    m = restart
    s = m if block is None else int(block)
    if not 1 <= s <= m:
        raise ValueError(f"block must be in [1, restart], got {s} vs m={m}")
    if m % s:
        raise ValueError(f"restart ({m}) must be a multiple of block ({s})")
    t = m // s
    apply_M = (lambda v: v) if M is None else M.apply
    if M is None:
        side = "none"
    if side not in ("left", "right", "none"):
        raise ValueError(f"side must be left/right/none, got {side!r}")

    def op(v):
        # left: Arnoldi on M^-1 A, preconditioned residual (reference
        # default, pca_gmres.rs:61); right: A M^-1, true residual
        if side == "right":
            return A.matvec(apply_M(v))
        if side == "left":
            return apply_M(A.matvec(v))
        return A.matvec(v)

    def residual(x):
        r = b - A.matvec(x)
        return apply_M(r) if side == "left" else r

    r0 = residual(x)
    res0 = jnp.sqrt(dot(r0, r0, axis_name))
    threshold = jnp.maximum(tol * res0, atol)
    hist = init_history(maxiter, res0, record_history)
    dtype = b.dtype
    n = b.shape[0]

    if basis == "newton" and shifts is not None:
        sh_re, sh_imsq, sh_gamma = (
            jnp.asarray(shifts[0], dtype),
            jnp.asarray(shifts[1], dtype),
            jnp.asarray(shifts[2], dtype),
        )
        if sh_re.shape != (s,):
            raise ValueError(
                f"shifts must be three ({s},) vectors (newton_shifts with "
                f"s={s}), got shape {sh_re.shape}"
            )
    elif basis == "newton":
        sh_re, sh_imsq, sh_gamma = _newton_shifts(op, r0, s, axis_name, dtype)
    elif basis == "monomial":
        sh_re = jnp.zeros(s, dtype=dtype)
        sh_imsq = jnp.zeros(s, dtype=dtype)
        sh_gamma = jnp.ones(s, dtype=dtype)
    else:
        raise ValueError(f"basis must be 'newton' or 'monomial', got {basis!r}")

    def body(c: _Carry) -> _Carry:
        r = residual(c.x)
        beta = jnp.sqrt(dot(r, r, axis_name))

        q0 = safe_div(r, beta)
        Q = jnp.zeros((m + 1, n), dtype=dtype).at[0].set(q0)
        AZc = jnp.zeros((m, m + 1), dtype=dtype)  # coords of A·Z over Q
        zblocks = []  # update directions, concatenated once at the end
        q_last = q0  # last orthonormal vector = seed of the next block

        for j in range(t):  # static unroll over blocks
            v = q_last
            # 1. basis powers u_i (s matvecs, ZERO reductions):
            #    newton: u_{i+1} = [(Op - re_i) u_i + imsq_i u_{i-1}] / g_i
            #    (imsq_i = Im(theta)^2 on the second member of a conjugate
            #    pair, combining (Op-theta)(Op-conj theta) in real
            #    arithmetic; g_i the equilibration scale keeping column
            #    norms O(1) — see _newton_shifts); monomial = zero shifts,
            #    unit scales
            # STATIC unroll + one stack, not lax.scan: the scan's stacked
            # ys output costs a full (s, n)-buffer pass per step on this
            # backend (measured 46.9 ms vs the ~6 ms matvec bound for
            # s=30 at 8M dof — ~1.25 ms/step, exactly one 960 MB copy);
            # with s static the unrolled form keeps each u_i as its own
            # 32 MB value and pays the (s, n) write ONCE at the stack.
            u_prev, u = jnp.zeros_like(v), v
            ws, d2l = [], []
            # fused basis step: on the beyond-VMEM planned path the
            # shift + norm ride the SpMV kernel's epilogue (one pass
            # instead of SpMV + a separate ~128 MB elementwise pass per
            # step at 8M dof); see DIAOperator.matvec_shift
            fused_shift = (
                side == "none"
                and axis_name is None
                and hasattr(A, "matvec_shift")
            )
            inv_g = 1.0 / sh_gamma
            for i in range(s):
                if fused_shift:
                    w, d2i = A.matvec_shift(
                        u, u_prev, sh_re[i], sh_imsq[i], inv_g[i]
                    )
                else:
                    w = (op(u) - sh_re[i] * u + sh_imsq[i] * u_prev) * inv_g[i]
                    # per-step LOCAL partial norm: fuses into w's
                    # producer (w is live in VMEM at this point) — still
                    # exactly ONE psum per block below
                    d2i = jnp.sum(w * w)
                ws.append(w)
                d2l.append(d2i)
                u_prev, u = u, w

            # exact norm equilibration (one psum per block): the static
            # gammas only bound growth to the Ritz-interval ESTIMATE; the
            # residual per-vector scale disparity still overflows
            # CholeskyQR2's cond^2 < 1/eps limit in f32 at s=30.
            # Normalize each generated vector exactly and fold the norms
            # into the recurrence coefficients below. The row scaling is
            # folded into the ONE (s, n) stack write (each w_i is still a
            # live SSA value), not a separate read+write pass.
            d2 = jnp.stack(d2l)
            if axis_name is not None:
                d2 = lax.psum(d2, axis_name)
            d = jnp.maximum(jnp.sqrt(d2), jnp.finfo(dtype).tiny)  # (s,)
            P0 = jnp.stack([ws[i] * (1.0 / d[i]) for i in range(s)])
            # dd[i] = ||u_i|| with u_0 = v already unit norm
            dd = jnp.concatenate([jnp.ones((1,), dtype=dtype), d])
            # Op u_i/dd[i] = g_i*(dd[i+1]/dd[i]) u_{i+1}/dd[i+1]
            #   + re_i u_i/dd[i] - q_i*(dd[i-1]/dd[i]) u_{i-1}/dd[i-1]
            g_eff = sh_gamma * d / dd[:s]
            q_eff = sh_imsq * jnp.concatenate(
                [jnp.ones((1,), dtype=dtype), dd[:-2]]
            ) / dd[:s]

            # 2. BCGS2 against the LIVE prefix of the running basis —
            #    rows 0..j*s of Q; j is a static Python index, so the
            #    slice is free. Projecting against the full (m+1, n)
            #    buffer reads the zero-padded rows too: at t=1 that is
            #    31 rows streamed where ONE is live (~4 ms/cycle of pure
            #    zero traffic at 8M dof, measured in the stage-6 BCGS2
            #    component).
            rows = j * s + 1
            Qlive = Q[:rows]
            C1 = _mm(P0, Qlive.T)  # (s, rows)
            if axis_name is not None:
                C1 = lax.psum(C1, axis_name)
            P1 = P0 - _mm(C1, Qlive)
            C2 = _mm(P1, Qlive.T)
            if axis_name is not None:
                C2 = lax.psum(C2, axis_name)
            P2 = P1 - _mm(C2, Qlive)
            Qnew, L = _cholqr2(P2, axis_name)  # P2 = L @ Qnew
            q_last = Qnew[s - 1]

            Q = lax.dynamic_update_slice(Q, Qnew, (rows, 0))
            # coords of u_1..u_s over the (now extended) basis:
            # P0 = (C1 + C2) @ Q_old + L @ Q_new
            T = jnp.zeros((s, m + 1), dtype=dtype)
            T = lax.dynamic_update_slice(T, C1 + C2, (0, 0))
            T = lax.dynamic_update_slice(T, L, (0, rows))  # (s, m+1)

            # Op acts on Z_block = [u_0, u_1, ..., u_{s-1}] (now the
            # NORMALIZED u_i; u_0 = v). By the scaled shifted recurrence
            # with the norms folded in, Op u_i = g_eff_i u_{i+1}
            # + re_i u_i - q_eff_i u_{i-1}; in coordinates over Q that is
            # g_eff_i*T[i] + re_i*Uc[i] - q_eff_i*Uc[i-1], with Uc[i] the
            # coords of u_i (u_0 = e_{js}; u_i = T[i-1] for i >= 1).
            # Monomial basis: zero shifts reduce this to g_eff_i*T[i]
            # (the pure norm scales).
            e0 = jnp.zeros((1, m + 1), dtype=dtype).at[0, j * s].set(1.0)
            Uc = jnp.concatenate([e0, T[: s - 1]], axis=0)  # (s, m+1)
            Uc_prev = jnp.concatenate(
                [jnp.zeros((1, m + 1), dtype=dtype), Uc[: s - 1]], axis=0
            )
            Tz = (
                g_eff[:, None] * T
                + sh_re[:, None] * Uc
                - q_eff[:, None] * Uc_prev
            )

            # Z rows are [v, u_1..u_{s-1}] — collected as SSA values and
            # concatenated straight into the y @ Z matmul at the end (the
            # old carried (m, n) Z buffer paid an extra full-copy pass
            # per block via dynamic_update_slice)
            zblocks.append(v[None, :])
            if s > 1:
                zblocks.append(P0[: s - 1])
            AZc = lax.dynamic_update_slice(AZc, Tz, (j * s, 0))

        # 3. projected LS over the orthonormal coordinates:
        #    min_y || beta e0 - y @ AZc ||_2
        # via regularized NORMAL EQUATIONS + Cholesky, not lstsq: the SVD
        # behind lstsq lowers through QDWH on TPU and takes tens of
        # minutes to COMPILE (measured; same pathology as in-jit
        # eigvalsh). AZc rows are coordinates over an orthonormal basis,
        # so G's conditioning is that of the small projected Hessenberg —
        # the tau ridge plays the role of lstsq's rcond cutoff (damps
        # singular directions below ~tau*sigma_max, the reference's drop
        # tolerance, pca_gmres.rs:46-50).
        rhs = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)
        G = _mm(AZc, AZc.T)  # (m, m)
        # Rank-deficiency guard (happy breakdown mid-block, Krylov space
        # smaller than the restart): rows whose basis vector collapsed
        # carry ~zero signal. Zero their coupling and pin their diagonal
        # so the Cholesky stays PD and their y entries solve to exactly
        # 0 — the exact analogue of lstsq dropping null directions (the
        # singular Gram would otherwise make cholesky return NaN and the
        # stall-guard would discard the whole, possibly converged, block).
        rn = jnp.diagonal(G)
        eps = float(jnp.finfo(dtype).eps)
        valid = rn > (16 * eps) ** 2 * jnp.max(rn)
        nvalid = jnp.maximum(jnp.sum(valid.astype(dtype)), 1.0)
        G = jnp.where(valid[:, None] & valid[None, :], G, 0.0)
        tr = jnp.sum(jnp.where(valid, rn, 0.0)) / nvalid
        # ridge stays TINY by default: the restart update needs the LS
        # solved nearly exactly (a sqrt(eps)-scale ridge measurably stalls
        # convergence at rtol 1e-8). But a Gram whose ROW SET is rank-
        # deficient (Krylov space smaller than the restart — unit-norm
        # rows, singular G) NaNs under the tiny ridge; detect that and
        # redo the solve with a sqrt(eps) ridge (regularized LS within
        # the actual Krylov space). Both solves are (m, m) — negligible.
        ridge = (tau if tau is not None else 50 * eps) ** 2
        c1 = jnp.where(valid, _mm(AZc, rhs), 0.0)

        def _ls(ridge_val):
            diag_fix = jnp.where(valid, ridge_val * tr, jnp.maximum(tr, 1.0))
            Lc = jnp.linalg.cholesky(G + jnp.diag(diag_fix))
            z1 = jax.scipy.linalg.solve_triangular(Lc, c1, lower=True)
            return jax.scipy.linalg.solve_triangular(Lc.T, z1, lower=False)

        y0 = _ls(jnp.asarray(ridge, dtype))
        y1 = _ls(jnp.asarray(jnp.sqrt(eps), dtype))
        y = jnp.where(jnp.all(jnp.isfinite(y0)), y0, y1)
        Z = jnp.concatenate(zblocks, axis=0)  # (m, n)
        update = _mm(y, Z)
        if side == "right":
            update = apply_M(update)
        x_new = c.x + update

        r_new = residual(x_new)
        res = jnp.sqrt(dot(r_new, r_new, axis_name))
        it = c.it + m
        # detect stagnation (ill-conditioned basis): no progress. NaN res
        # (collapsed basis -> Cholesky NaN) must count as stalled, so the
        # test is the negation of "strictly improved" (NaN-safe).
        stalled = ~(res < c.res * (1.0 - 1e-12))
        reached = res <= threshold
        done = reached | (it >= maxiter) | stalled
        brk = jnp.where(
            stalled & ~reached, jnp.int32(Breakdown.SCALAR_BREAKDOWN), c.breakdown
        )
        hist_new = (
            None if c.hist is None else c.hist.at[jnp.minimum(it, maxiter)].set(res)
        )
        # keep the better iterate on stall
        better = res < c.res
        x_keep = jnp.where(better, x_new, c.x)
        res_keep = jnp.where(better, res, c.res)
        return _Carry(x_keep, it, res_keep, done, brk, hist_new)

    init = _Carry(
        x, jnp.int32(0), res0, res0 <= threshold,
        jnp.int32(Breakdown.NONE), hist,
    )
    final = lax.while_loop(lambda c: (~c.done) & (c.it < maxiter), body, init)
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
