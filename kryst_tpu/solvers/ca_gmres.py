"""CA-GMRES — communication-avoiding s-step GMRES.

TPU-native redesign of the reference PcaGmresSolver (src/solver/
pca_gmres.rs; Hoemmen 2010, Ghysels–Vanroose 2014, cited at
pca_gmres.rs:18-20), with the reference's full parameter surface
(pca_gmres.rs:37-50): restart length ``m``, s-step block size ``s``
(``block``), and drop tolerance ``tau``. Each restart cycle accumulates
``t = m/s`` blocks toward an m-dimensional Krylov space
(pca_gmres.rs:136-274 loops ``while j < m`` over blocks of s):

1. block j generates s monomial Krylov vectors from the latest
   orthonormal vector — s back-to-back matvecs, ZERO reductions
   (pca_gmres.rs:141-159);
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
4. ``x += y @ Z`` (right preconditioning applies M^-1 once), true
   residual recomputed, restart.

``tau`` maps the reference's drop tolerance (pca_gmres.rs:46-50) onto
the LS solve: singular directions below ``tau`` (relative) are dropped
(``lstsq rcond``), which is what keeps a partially collapsed monomial
basis from polluting the update.

The reference's ``pipeline_depth`` (ell) schedules matvecs against
in-flight reductions by hand; under XLA the matvec chain of block j+1
carries no data dependency on block j's Gram psums until the BCGS2
subtraction, so the latency-hiding scheduler overlaps them — ell is a
compiler decision here, not a knob (documented capability mapping).

The monomial basis conditions like kappa(A)^s per BLOCK (not per
restart), so ``block`` stays modest (4-12) while ``restart`` can match
standard GMRES (30+) — Hoemmen §3's point.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array, lax

from kryst_tpu.core.convergence import Breakdown, make_stats
from kryst_tpu.core.linop import as_operator
from kryst_tpu.solvers._common import default_x0, dot, init_history, safe_div


class _Carry(NamedTuple):
    x: Array
    it: Array
    res: Array
    done: Array
    breakdown: Array
    hist: Optional[Array]


def _cholqr2(K: Array, axis_name: Optional[str]):
    """CholeskyQR2: returns (Q, L) with K (rows) = L @ Q; one Gram
    reduction (psum) per pass."""

    def _pass(K):
        G = K @ K.T  # (s, s) panel — the single fused reduction
        if axis_name is not None:
            G = lax.psum(G, axis_name)
        # jitter for semi-definite Gram matrices (monomial bases collapse)
        eps = jnp.finfo(K.dtype).eps
        G = G + (eps * jnp.trace(G)) * jnp.eye(G.shape[0], dtype=K.dtype)
        L = jnp.linalg.cholesky(G)
        Q = jax.scipy.linalg.solve_triangular(L, K, lower=True)
        return Q, L

    Q1, L1 = _pass(K)
    Q2, L2 = _pass(Q1)
    return Q2, L1 @ L2  # K = (L1 L2) Q2


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
    record_history: bool = False,
    axis_name: Optional[str] = None,
):
    """Returns ``(x, SolveStats)``.

    ``restart``: Krylov dimension m per cycle (reference ``restart``,
    pca_gmres.rs:38). ``block``: s-step size (reference ``block_size``);
    ``None`` uses one block per cycle (s = m). ``tau``: relative drop
    tolerance for the projected LS solve (reference ``drop_tol``);
    ``None`` uses the lstsq machine default.
    """
    A = as_operator(A)
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
    if side not in ("right", "none"):
        raise ValueError("ca_gmres supports side='right' or unpreconditioned")

    def op(v):
        return A.matvec(apply_M(v)) if side == "right" else A.matvec(v)

    r0 = b - A.matvec(x)
    res0 = jnp.sqrt(dot(r0, r0, axis_name))
    threshold = jnp.maximum(tol * res0, atol)
    hist = init_history(maxiter, res0, record_history)
    dtype = b.dtype
    n = b.shape[0]

    def body(c: _Carry) -> _Carry:
        r = b - A.matvec(c.x)
        beta = jnp.sqrt(dot(r, r, axis_name))

        Q = jnp.zeros((m + 1, n), dtype=dtype).at[0].set(safe_div(r, beta))
        Z = jnp.zeros((m, n), dtype=dtype)  # the update directions
        AZc = jnp.zeros((m, m + 1), dtype=dtype)  # coords of A·Z over Q

        for j in range(t):  # static unroll over blocks
            v = Q[j * s]
            # 1. monomial powers: u_i = Op^i v, i = 1..s (s matvecs, 0 psums)
            def gen(carry, _):
                w = op(carry)
                return w, w

            _, P0 = lax.scan(gen, v, None, length=s)  # (s, n)

            # 2. BCGS2 against the running basis (zero-padded rows of Q
            #    contribute zero projections, so no masking is needed)
            C1 = P0 @ Q.T
            if axis_name is not None:
                C1 = lax.psum(C1, axis_name)
            P1 = P0 - C1 @ Q
            C2 = P1 @ Q.T
            if axis_name is not None:
                C2 = lax.psum(C2, axis_name)
            P2 = P1 - C2 @ Q
            Qnew, L = _cholqr2(P2, axis_name)  # P2 = L @ Qnew

            Q = lax.dynamic_update_slice(Q, Qnew, (j * s + 1, 0))
            # coords of u_1..u_s over the (now extended) basis:
            # P0 = (C1 + C2) @ Q_old + L @ Q_new
            T = C1 + C2
            T = lax.dynamic_update_slice(
                T, L, (0, j * s + 1)
            )  # (s, m+1)

            # A acts on Z_block = [v, u_1, ..., u_{s-1}] giving [u_1..u_s],
            # whose coordinates are exactly T (shift identity)
            Zblock = jnp.concatenate([v[None, :], P0[: s - 1]], axis=0)
            Z = lax.dynamic_update_slice(Z, Zblock, (j * s, 0))
            AZc = lax.dynamic_update_slice(AZc, T, (j * s, 0))

        # 3. projected LS over the orthonormal coordinates:
        #    min_y || beta e0 - y @ AZc ||_2
        rhs = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(AZc.T, rhs, rcond=tau)
        update = y @ Z
        if side == "right":
            update = apply_M(update)
        x_new = c.x + update

        r_new = b - A.matvec(x_new)
        res = jnp.sqrt(dot(r_new, r_new, axis_name))
        it = c.it + m
        # detect stagnation (ill-conditioned monomial basis): no progress
        stalled = res >= c.res * (1.0 - 1e-12)
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
