"""Block GMRES(m) — one shared block-Arnoldi space for k right-hand sides.

Completes the block-solver pair started by :mod:`solvers.block_cg`
(block PCG for SPD systems): nonsymmetric (n, k) RHS blocks solve in a
SINGLE block-Krylov space instead of k vmapped independent GMRES runs.
Beyond-reference capability — the reference's GmresSolver is single-RHS
(src/solver/gmres.rs); its building blocks reappear here in block form:

- the Arnoldi loop (gmres.rs:83-96) becomes a block recurrence: one
  block matvec (``matvec_block`` — single coefficient-stream pass for
  all k columns) + CGS2 block panels (two (jk, n) x (n, k) matmuls per
  pass — MXU shapes) + CholeskyQR2 orthonormalization of the new k
  vectors (reused from solvers/ca_gmres.py);
- the Givens/back-substitution pair (gmres.rs:154-192) becomes one
  ridge-guarded normal-equation solve of the block Hessenberg LS
  min_Y ||E1 L0 - H Y||_F per restart — an (mk, mk) on-device Cholesky
  (lstsq/SVD compile through QDWH on this TPU backend and are unusable
  in-jit; same decision as ca_gmres);
- the restart-boundary true residual (gmres.rs:387-398) is kept: per
  column, with a NaN-safe keep-best + stall guard (a collapsed block
  basis must degrade to "no progress", never poison the iterate).

Basis vectors are stored as ROWS ((m+1)k, n) — the panel/matmul-friendly
layout shared with gmres.py and ca_gmres.py.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array, lax

from kryst_tpu.core.convergence import Breakdown, make_stats
from kryst_tpu.core.linop import as_operator
from kryst_tpu.solvers._common import prepare_loop
from kryst_tpu.solvers.block_cg import matvec_cols
from kryst_tpu.solvers.ca_gmres import _cholqr2, _mm


class _Carry(NamedTuple):
    X: Array  # (k, n) current iterates, row layout
    res: Array  # (k,) per-column residual norms
    it: Array
    done: Array
    breakdown: Array


def block_gmres(
    A,
    B,
    X0=None,
    *,
    M=None,
    side: str = "right",
    tol: float = 1e-8,
    atol: float = 0.0,
    maxiter: int = 1000,
    restart: int = 20,
    axis_name: Optional[str] = None,
):
    """Solve A X = B for an (n, k) block with restarted block GMRES.

    ``maxiter`` counts Krylov dimensions per column (restart cycles x
    restart), matching ``gmres``. ``side``: "right" or "none" — right
    preconditioning keeps the TRUE residual observable per restart.
    Returns ``(X, SolveStats)`` with per-column residual stats (shape
    (k,)) and the shared iteration count.
    """
    B = jnp.asarray(B)
    if B.ndim != 2:
        raise ValueError(f"B must be (n, k), got {B.shape}")
    A = prepare_loop(as_operator(A, dtype=B.dtype))
    M = prepare_loop(M)
    n, k = B.shape
    m = restart
    if side not in ("right", "none"):
        raise ValueError("block_gmres supports side='right' or unpreconditioned")
    apply_M = (lambda V: V) if M is None else (
        lambda V: jax.vmap(M.apply, in_axes=0, out_axes=0)(V)
    )
    if M is None:
        side = "none"
    dtype = B.dtype
    eps = float(jnp.finfo(dtype).eps)
    Bt = B.T  # (k, n) rows

    def op_rows(V):  # A (M^-1) applied to each ROW of V (k, n)
        W = apply_M(V) if side == "right" else V
        return matvec_cols(A, W)

    def colnorms(V):  # norms of the k rows
        s = jnp.sum(V * V, axis=1)
        if axis_name is not None:
            s = lax.psum(s, axis_name)
        return jnp.sqrt(s)

    # zeros_like keeps the shard_map varying-axis type of B (a fresh
    # constant would be unvarying and break the while_loop carry)
    X = jnp.zeros_like(Bt) if X0 is None else jnp.asarray(X0, dtype).T
    R0 = Bt - matvec_cols(A, X)
    res0 = colnorms(R0)
    thresh = jnp.maximum(tol * jnp.where(res0 > 0, res0, 1.0), atol)
    mp1k = (m + 1) * k

    def body(c: _Carry) -> _Carry:
        R = Bt - matvec_cols(A, c.X)  # (k, n)
        Q0, L0 = _cholqr2(R, axis_name)  # R = L0 @ Q0
        V = jnp.zeros((mp1k, n), dtype)
        V = lax.dynamic_update_slice(V, Q0, (0, 0))
        H = jnp.zeros((mp1k, m * k), dtype)

        def arnoldi(j, carry):
            V, H = carry
            Vj = lax.dynamic_slice(V, (j * k, 0), (k, n))
            W = op_rows(Vj)  # (k, n)
            # CGS2 against rows 0..(j+1)k-1; inactive rows of V are zero
            # so the full-width panels need no masking
            C1 = _mm(W, V.T)  # (k, mp1k)
            if axis_name is not None:
                C1 = lax.psum(C1, axis_name)
            W = W - _mm(C1, V)
            C2 = _mm(W, V.T)
            if axis_name is not None:
                C2 = lax.psum(C2, axis_name)
            W = W - _mm(C2, V)
            Qn, L = _cholqr2(W, axis_name)  # W = L @ Qn
            V = lax.dynamic_update_slice(V, Qn, ((j + 1) * k, 0))
            # column block j of H: coords of A Vj over the basis
            Hcol = (C1 + C2).T  # (mp1k, k)
            Hcol = lax.dynamic_update_slice(Hcol, L.T, ((j + 1) * k, 0))
            H = lax.dynamic_update_slice(H, Hcol, (0, j * k))
            return V, H

        V, H = lax.fori_loop(0, m, arnoldi, (V, H))

        # projected LS: min_Y || E1 L0 - H Y ||_F via ridge-guarded
        # normal equations (same rank-loss handling as ca_gmres: dead
        # directions decoupled + pinned, NaN fallback to a sqrt(eps)
        # ridge)
        # coords of residual column i over the basis rows: row i of R is
        # L0[i, :] @ Q0, so rhs[:k] = L0^T (column i holds L0[i, :])
        rhs = jnp.zeros((mp1k, k), dtype)
        rhs = lax.dynamic_update_slice(rhs, L0.T, (0, 0))
        G = _mm(H.T, H)  # (mk, mk)
        C = _mm(H.T, rhs)  # (mk, k)
        d = jnp.diagonal(G)
        valid = d > (16 * eps) ** 2 * jnp.maximum(jnp.max(d), 0.0)
        nvalid = jnp.maximum(jnp.sum(valid.astype(dtype)), 1.0)
        Gm = jnp.where(valid[:, None] & valid[None, :], G, 0.0)
        tr = jnp.sum(jnp.where(valid, d, 0.0)) / nvalid
        Cm = jnp.where(valid[:, None], C, 0.0)

        def _ls(ridge):
            fix = jnp.where(valid, ridge * tr, jnp.maximum(tr, 1.0))
            Lc = jnp.linalg.cholesky(Gm + jnp.diag(fix))
            Z = jax.scipy.linalg.solve_triangular(Lc, Cm, lower=True)
            return jax.scipy.linalg.solve_triangular(Lc.T, Z, lower=False)

        Y0 = _ls(jnp.asarray((50 * eps) ** 2, dtype))
        Y1 = _ls(jnp.asarray(jnp.sqrt(eps), dtype))
        Y = jnp.where(jnp.all(jnp.isfinite(Y0)), Y0, Y1)

        update = _mm(Y.T, V[: m * k])  # (k, n)
        if side == "right":
            update = apply_M(update)
        X_new = c.X + update

        R_new = Bt - matvec_cols(A, X_new)
        res = colnorms(R_new)
        it = c.it + m
        reached = jnp.all(res <= thresh)
        # NaN-safe keep-best per column + stall guard (collapsed basis)
        better = res < c.res
        X_keep = jnp.where(better[:, None], X_new, c.X)
        res_keep = jnp.where(better, res, c.res)
        stalled = ~jnp.any(res < c.res * (1.0 - 1e-12))
        brk = jnp.where(
            stalled & ~reached,
            jnp.int32(Breakdown.SCALAR_BREAKDOWN),
            c.breakdown,
        )
        done = reached | stalled | (it >= maxiter)
        return _Carry(X_keep, res_keep, it, done, brk)

    init = _Carry(
        X, res0, jnp.int32(0), jnp.all(res0 <= thresh),
        jnp.int32(Breakdown.NONE),
    )
    final = lax.while_loop(lambda c: (~c.done) & (c.it < maxiter), body, init)
    reached = final.res <= thresh
    stats = make_stats(
        final.it,
        final.res,
        jnp.where(res0 > 0, final.res / jnp.where(res0 > 0, res0, 1.0), 0.0),
        reached,
        final.breakdown,
        maxiter,
        None,
    )
    return final.X.T, stats
