"""Block preconditioned CG — one Krylov iteration for k right-hand sides.

Beyond-reference capability (the reference's ``LinearSolver`` is
single-RHS; multi-RHS there means k independent solves). On TPU a BLOCK
iteration is the natural shape:

- the block matvec ``A @ X`` streams the operator coefficients ONCE for
  all k columns (``DIAOperator.matvec_block``) — beyond VMEM a vmapped
  per-column solve re-reads the dominant coefficient panels k times;
- every reduction is a small (k, k) matmul ``R^T Z`` — MXU work instead
  of k separate scalar reductions;
- the shared block Krylov space converges in FEWER iterations than any
  single column alone once spectral information from one column helps
  another (O'Leary 1980).

Algorithm (O'Leary's block PCG with the standard small-matrix updates):

    S = R^T Z;  loop:  T = P^T (A P);  alpha = T^{-1} S
                       X += P alpha;   R -= (A P) alpha;  Z = M R
                       S' = R^T Z;     beta = S^{-1} S'
                       P  = Z + P beta; S = S'

Rank deficiency (a converged or linearly dependent column) makes T / S
singular; both small solves are protected the same way as the CA-GMRES
projected LS (solvers/ca_gmres.py): zero-coupling + diagonal pinning for
dead directions plus a tiny trace-scaled ridge, so dead columns simply
stop moving while live ones keep converging.

Small solves run at ``Precision.HIGHEST`` — TPU's default f32 matmul
rounds through bf16, which is fatal for k x k normal-equation solves.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array, lax

from kryst_tpu.core.convergence import Breakdown, make_stats
from kryst_tpu.core.linop import as_operator


def _mm(a, b):
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)


def matvec_block(A, X: Array) -> Array:
    """A @ X for (n, k) blocks: the operator's native block matvec when
    it has one (single coefficient pass), else vmap over columns."""
    f = getattr(A, "matvec_block", None)
    if f is not None:
        return f(X)
    return jax.vmap(A.matvec, in_axes=1, out_axes=1)(X)


def matvec_cols(A, Xk: Array) -> Array:
    """A @ X for (k, n) rows-of-columns blocks — the solvers' internal
    layout (each RHS contiguous, zero layout transposes on the streaming
    path; see DIAOperator.matvec_cols)."""
    f = getattr(A, "matvec_cols", None)
    if f is not None:
        return f(Xk)
    f = getattr(A, "matvec_block", None)
    if f is not None:
        return f(Xk.T).T
    return jax.vmap(A.matvec)(Xk)


def _solve_small_spd(G: Array, B: Array, eps: float):
    """Solve G Y = B for a (k, k) SPD-up-to-rank-loss Gram matrix.

    Dead directions (diagonal ~0 relative to the largest) are decoupled
    and pinned so their solution rows are exactly zero; a trace-scaled
    ridge keeps the Cholesky finite under roundoff-level indefiniteness.
    """
    d = jnp.diagonal(G)
    valid = d > (16 * eps) ** 2 * jnp.maximum(jnp.max(d), 0.0)
    nvalid = jnp.maximum(jnp.sum(valid.astype(G.dtype)), 1.0)
    Gm = jnp.where(valid[:, None] & valid[None, :], G, 0.0)
    tr = jnp.sum(jnp.where(valid, d, 0.0)) / nvalid
    diag_fix = jnp.where(valid, (50 * eps) * tr, jnp.maximum(tr, 1.0))
    L = jnp.linalg.cholesky(Gm + jnp.diag(diag_fix))
    Bm = jnp.where(valid[:, None], B, 0.0)
    Y = jax.scipy.linalg.solve_triangular(L, Bm, lower=True)
    Y = jax.scipy.linalg.solve_triangular(L.T, Y, lower=False)
    return jnp.where(valid[:, None], Y, 0.0)


class _Carry(NamedTuple):
    X: Array
    R: Array
    P: Array
    S: Array  # (k, k) R^T Z
    res: Array  # (k,) per-column residual norms
    it: Array
    done: Array


def block_pcg(
    A,
    B,
    X0=None,
    *,
    M=None,
    tol: float = 1e-8,
    atol: float = 0.0,
    maxiter: int = 1000,
    axis_name: Optional[str] = None,
):
    """Solve A X = B for an (n, k) block of right-hand sides.

    Returns ``(X, SolveStats)`` with per-column ``final_residual`` /
    ``rel_residual`` / ``reached_tol`` (shape (k,)); ``iterations`` is
    the shared block-iteration count. Columns that converge (or become
    linearly dependent inside the block) are frozen by the rank guard
    while the rest continue.
    """
    B = jnp.asarray(B)
    if B.ndim != 2:
        raise ValueError(f"B must be (n, k), got {B.shape}")
    A = as_operator(A, dtype=B.dtype)
    n, k = B.shape
    # internal layout is (k, n) rows-of-columns: the streaming block
    # matvec ingests it transpose-free (the (n, k) layout paid two
    # strided 256 MB layout moves per matvec at 8M k=8, round 3), and
    # every Gram stays one dot_general. Entry/exit transposes only.
    Bk = B.T
    Xk = jnp.zeros_like(Bk) if X0 is None else jnp.asarray(X0, B.dtype).T
    apply_M = (lambda V: V) if M is None else (lambda V: jax.vmap(M.apply)(V))
    eps = float(jnp.finfo(B.dtype).eps)

    def colnorms(V):
        s = jnp.sum(V * V, axis=1)
        if axis_name is not None:
            s = lax.psum(s, axis_name)
        return jnp.sqrt(s)

    def gram(U, V):
        # U V^T without materializing a transpose: contract the long axis
        G = lax.dot_general(
            U, V, (((1,), (1,)), ((), ())), precision=lax.Precision.HIGHEST
        )
        if axis_name is not None:
            G = lax.psum(G, axis_name)
        return G

    R = Bk - matvec_cols(A, Xk)
    Z = apply_M(R)
    res0 = colnorms(R)
    thresh = jnp.maximum(tol * jnp.where(res0 > 0, res0, 1.0), atol)
    S0 = gram(R, Z)

    def cond(c: _Carry):
        return (~c.done) & (c.it < maxiter)

    def body(c: _Carry) -> _Carry:
        Q = matvec_cols(A, c.P)
        T = gram(c.P, Q)
        alpha = _solve_small_spd(T, c.S, eps)
        # (P alpha)^T = alpha^T P_k: the (k, k) transpose is free
        X = c.X + _mm(alpha.T, c.P)
        R = c.R - _mm(alpha.T, Q)
        Z = apply_M(R)
        S_new = gram(R, Z)
        beta = _solve_small_spd(c.S, S_new, eps)
        P = Z + _mm(beta.T, c.P)
        res = colnorms(R)
        done = jnp.all(res <= thresh)
        return _Carry(X, R, P, S_new, res, c.it + 1, done)

    init = _Carry(Xk, R, Z, S0, res0, jnp.int32(0),
                  jnp.all(res0 <= thresh))
    final = lax.while_loop(cond, body, init)
    reached = final.res <= thresh
    stats = make_stats(
        final.it,
        final.res,
        jnp.where(res0 > 0, final.res / jnp.where(res0 > 0, res0, 1.0), 0.0),
        reached,
        jnp.int32(Breakdown.NONE),
        maxiter,
        None,
    )
    return final.X.T, stats
