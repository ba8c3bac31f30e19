"""CA-GMRES — communication-avoiding s-step GMRES.

TPU-native redesign of the reference PcaGmresSolver (src/solver/
pca_gmres.rs; Hoemmen 2010, Ghysels–Vanroose 2014, cited at
pca_gmres.rs:18-20). The reference generates s Krylov vectors per block
and orthogonalizes them with a single overlapped reduction
(pca_gmres.rs:136-229). Here each restart cycle is fully
communication-avoiding:

1. generate the s+1-vector monomial Krylov basis K = [r, Op r, ..., Op^s r]
   with s back-to-back matvecs — ZERO reductions (pca_gmres.rs:141-159);
2. orthonormalize K by CholeskyQR2: the Gram matrix G = K^T K is ONE
   matmul panel = ONE fused reduction (= one psum on a mesh) per pass —
   the TPU form of the reference's flat local_dot buffer + single
   all-reduce (pca_gmres.rs:172-211);
3. exploit the shift identity  Op K_s = K_{s+1} B  (B the (s+1,s) shift
   matrix) to reduce the projected least-squares problem to the tiny
   (s+1)xs system  min_y || R e_1 ||r|| - R B y ||, solved on device;
4. update x += K_s y (right preconditioning applies M^-1 once), recompute
   the true residual, restart.

The monomial basis conditions like kappa(A)^s, so ``s`` (the ``restart``)
should stay modest (6-16); this is the documented trade of all s-step
methods (Hoemmen §3). Each cycle costs s matvecs + 2 Gram reductions —
a ~s-fold reduction-count saving over standard GMRES(s).
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
    """CholeskyQR2: returns (Q, R) with one Gram reduction per pass."""

    def _pass(K):
        G = K @ K.T  # (s+1, s+1) panel — the single fused reduction
        if axis_name is not None:
            G = lax.psum(G, axis_name)
        # jitter for semi-definite Gram matrices (monomial bases collapse)
        eps = jnp.finfo(K.dtype).eps
        G = G + (eps * jnp.trace(G)) * jnp.eye(G.shape[0], dtype=K.dtype)
        L = jnp.linalg.cholesky(G)
        Q = jax.scipy.linalg.solve_triangular(L, K, lower=True)
        return Q, L.T  # K = Q^T? rows: K (s+1, n): K = L Q -> R = L^T ...

    Q1, R1t = _pass(K)
    Q2, R2t = _pass(Q1)
    # K^T = Q^T R with R = (R2t? ...): K = L1 Q1, Q1 = L2 Q2 ->
    # K = L1 L2 Q2 -> R = (L1 L2)^T as upper? we return row-basis Q2 and
    # the combined lower-triangular factor L = L1 @ L2 so K = L Q2.
    L = R1t.T @ R2t.T
    return Q2, L  # K (rows) = L @ Q2


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
    restart: int = 8,
    record_history: bool = False,
    axis_name: Optional[str] = None,
):
    """Returns ``(x, SolveStats)``. ``restart`` is the s-step block size."""
    A = as_operator(A)
    b = jnp.asarray(b)
    x = default_x0(b, x0)
    n = b.shape[0]
    s = restart
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

    # (s+1, s) shift matrix B: Op K[:s] = K B with monomial K
    B = jnp.eye(s + 1, s, k=-1, dtype=b.dtype)

    def body(c: _Carry) -> _Carry:
        r = b - A.matvec(c.x)
        beta = jnp.sqrt(dot(r, r, axis_name))

        # 1. monomial basis: s matvecs, no reductions (pca_gmres.rs:141-159)
        def gen(carry, _):
            v = carry
            w = op(v)
            return w, v

        _, K = lax.scan(gen, safe_div(r, beta), None, length=s + 1)
        # K: (s+1, n) rows [v, Op v, ..., Op^s v]

        # 2. CholeskyQR2 — two fused Gram reductions (pca_gmres.rs:172-211)
        Q, L = _cholqr2(K, axis_name)

        # 3. projected LS: min_y || beta e1 - R B y ||, where K = L Q
        #    Op K[:s] = K B  =>  Op K[:s]^T cols = Q^T (L^T? ) ...
        # In row convention: K = L @ Q (rows). r = beta * K[0] = beta L[0] Q.
        # Op applied to columns K_s: (K B)^T rows: B^T K = (B^T L) Q.
        RB = B.T @ L  # (s, s+1): row-basis coefficients of Op K[:s]
        rhs = beta * L[0]  # (s+1,)
        # solve min_y || rhs - y @ RB ||  (y: (s,))
        y, *_ = jnp.linalg.lstsq(RB.T, rhs)
        update = y @ K[:s]
        if side == "right":
            update = apply_M(update)
        x_new = c.x + update

        r_new = b - A.matvec(x_new)
        res = jnp.sqrt(dot(r_new, r_new, axis_name))
        it = c.it + s
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
