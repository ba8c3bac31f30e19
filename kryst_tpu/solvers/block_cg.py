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
from kryst_tpu.solvers._common import prepare_loop


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

    Fast path: masked, trace-ridged Cholesky (a handful of ops — this
    runs INSIDE the solver loop, twice per block iteration). Rescue
    path: near convergence the f32 Gram at 8M k=8 picks up small
    negative eigenvalues a diagonal ridge cannot always cover, and
    cholesky(indefinite) poisons the whole carry chain (round-4 NaN
    bug). When the Cholesky factor is non-finite, a ``lax.cond``
    switches to a truncated eigen-pseudoinverse (jit-safe cyclic Jacobi
    — the TPU backend cannot lower eigh in-jit; eigenvalues below
    4k*eps*lam_max are DROPPED). The eig branch costs ~0.5 ms (336
    scan-step rotations at k=8) so it must stay OFF the common path:
    an unconditional eig solve measured 9.2 ms/block-iter at 1M where
    the Cholesky form runs 1.1 ms (bench round 4).
    Dead directions (diagonal ~0) are zeroed on the way in so their
    rows never re-enter through roundoff coupling.
    """
    from kryst_tpu.utils.smalleig import jacobi_eigh

    d = jnp.diagonal(G)
    valid = d > (16 * eps) ** 2 * jnp.maximum(jnp.max(d), 0.0)
    Gm = jnp.where(valid[:, None] & valid[None, :], G, 0.0)
    Gm = 0.5 * (Gm + Gm.T)
    Bm = jnp.where(valid[:, None], B, 0.0)
    k = G.shape[0]
    nvalid = jnp.maximum(jnp.sum(valid.astype(G.dtype)), 1.0)
    tr = jnp.sum(jnp.where(valid, d, 0.0)) / nvalid
    diag_fix = jnp.where(valid, (50 * eps) * tr, jnp.maximum(tr, 1.0))
    L = jnp.linalg.cholesky(Gm + jnp.diag(diag_fix))
    ok = jnp.all(jnp.isfinite(L))

    def chol_solve(_):
        Y = jax.scipy.linalg.solve_triangular(L, Bm, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, Y, lower=False)

    def eig_solve(_):
        lam, V = jacobi_eigh(Gm)
        lmax = jnp.maximum(jnp.max(lam), 0.0)
        keep = lam > (4 * k) * eps * lmax
        lam_inv = jnp.where(keep, 1.0 / jnp.where(keep, lam, 1.0), 0.0)
        return _mm(V, lam_inv[:, None] * _mm(V.T, Bm))

    Y = lax.cond(ok, chol_solve, eig_solve, None)
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
    inter: Optional[bool] = None,
):
    """Solve A X = B for an (n, k) block of right-hand sides.

    Returns ``(X, SolveStats)`` with per-column ``final_residual`` /
    ``rel_residual`` / ``reached_tol`` (shape (k,)); ``iterations`` is
    the shared block-iteration count. Columns that converge (or become
    linearly dependent inside the block) are frozen by the rank guard
    while the rest continue.

    ``inter``: use the block-interleaved carrier layout internally
    (ops/streamed.py::interleave_cols): matvecs read/write contiguous
    per-block column groups instead of the (k, n) path's serialized
    plane DMAs + XLA copies (6.16 -> 2.64 ms per matvec at 8M k=8,
    measured). None = automatic: on when ``A.inter_ok(k)`` and the PC
    is None or diagonal (JacobiPC — its inv_diag maps into the carrier;
    other PCs would force two layout transposes per iteration).
    """
    B = jnp.asarray(B)
    if B.ndim != 2:
        raise ValueError(f"B must be (n, k), got {B.shape}")
    A = prepare_loop(as_operator(A, dtype=B.dtype))
    M = prepare_loop(M)
    n, k = B.shape
    eps = float(jnp.finfo(B.dtype).eps)

    from kryst_tpu.pc.jacobi import JacobiPC

    diag_pc = M is None or isinstance(M, JacobiPC)
    if inter is None:
        ok = getattr(A, "inter_ok", None)
        inter = bool(ok(k)) if ok is not None else False
        inter = inter and diag_pc and axis_name is None
    if inter and not diag_pc:
        raise ValueError(
            "inter=True supports only M=None or JacobiPC (other PCs "
            "need the (k, n) layout; pass inter=False)"
        )
    if inter and axis_name is not None:
        raise ValueError(
            "inter=True is single-device only: the carrier kernels "
            "(carrier_gram / matvec_inter) compute shard-local Grams "
            "with no psum, so a sharded run would silently produce "
            "wrong alpha/beta and false convergence. Pass inter=False "
            "for sharded block solves."
        )
    if inter and getattr(A, "plan", None) is None:
        raise ValueError(
            "inter=True needs a planned streaming operator (A.plan is "
            "None — call A.planned() or csr_to_dia on a beyond-VMEM "
            "operator first, or pass inter=False)"
        )

    if inter:
        from kryst_tpu.ops.streamed import (
            _on_cpu, carrier_colmix_add, carrier_gram, deinterleave_cols,
            interleave_cols, interleave_diag,
        )

        plan = A.plan
        nb2 = plan.nblk + 2
        bm = plan.block_rows
        itp = _on_cpu()

        Bk = interleave_cols(B.T, plan)
        Xk = (
            jnp.zeros_like(Bk)
            if X0 is None
            else interleave_cols(jnp.asarray(X0, B.dtype).T, plan)
        )
        jac = M is not None
        dinv_rows = None
        if jac:
            dinv_rows = interleave_diag(
                jnp.asarray(M.inv_diag, B.dtype), plan
            ).reshape(nb2 * bm, 128)
            apply_M = lambda V: (
                V.reshape(nb2, k, bm, 128)
                * dinv_rows.reshape(nb2, 1, bm, 128)
            ).reshape(V.shape)
        else:
            apply_M = lambda V: V

        def do_matvec(V):
            return A.matvec_inter(V, k)

        def matvec_gram(P):
            # Q = A P and T = P^T Q from ONE kernel: the Gram accumulates
            # in SMEM from the blocks the matvec already has resident,
            # saving carrier_gram's 2 extra streamed reads per iteration
            return A.matvec_inter(P, k, with_gram=True)

        def S_res_z(R):
            # fused: S = R^T (M R) and per-column ||R||^2 in ONE pass
            S, n2 = carrier_gram(
                R, R, plan, k, diag=dinv_rows, scale=jac,
                with_norms=True, interpret=itp,
            )
            return S, jnp.sqrt(n2), None

        def add_mix(W, C, V):
            # W + sum_k C[k, q] V_k
            return carrier_colmix_add(V, W, C, plan, k, interpret=itp)

        def mix_P(Z_unused, R, beta, P):
            # P' = M R + P beta (Jacobi fused into the same pass)
            return carrier_colmix_add(
                P, R, beta, plan, k, diag=dinv_rows, scale=jac,
                interpret=itp,
            )
    else:
        # internal layout is (k, n) rows-of-columns: the streaming block
        # matvec ingests it transpose-free (the (n, k) layout paid two
        # strided 256 MB layout moves per matvec at 8M k=8, round 3), and
        # every Gram stays one dot_general. Entry/exit transposes only.
        Bk = B.T
        Xk = jnp.zeros_like(Bk) if X0 is None else jnp.asarray(X0, B.dtype).T
        apply_M = (
            (lambda V: V) if M is None else (lambda V: jax.vmap(M.apply)(V))
        )

        def do_matvec(V):
            return matvec_cols(A, V)

        def colnorms(V):
            s = jnp.sum(V * V, axis=1)
            if axis_name is not None:
                s = lax.psum(s, axis_name)
            return jnp.sqrt(s)

        def gram(U, V):
            # U V^T without materializing a transpose: contract the long
            # axis
            G = lax.dot_general(
                U, V, (((1,), (1,)), ((), ())),
                precision=lax.Precision.HIGHEST,
            )
            if axis_name is not None:
                G = lax.psum(G, axis_name)
            return G

        def matvec_gram(P):
            Q = do_matvec(P)
            return Q, gram(P, Q)

        def S_res_z(R):
            Z = apply_M(R)
            return gram(R, Z), colnorms(R), Z

        def add_mix(W, C, V):
            # W + sum_k C[k, q] V_k ((P alpha)^T = alpha^T P_k: the
            # (k, k) transpose is free)
            return W + _mm(C.T, V)

        def mix_P(Z, R, beta, P):
            return Z + _mm(beta.T, P)

    R = Bk - do_matvec(Xk)
    S0, res0, Z0 = S_res_z(R)
    P0 = apply_M(R) if Z0 is None else Z0
    thresh = jnp.maximum(tol * jnp.where(res0 > 0, res0, 1.0), atol)

    def cond(c: _Carry):
        return (~c.done) & (c.it < maxiter)

    def body(c: _Carry) -> _Carry:
        Q, T = matvec_gram(c.P)
        alpha = _solve_small_spd(T, c.S, eps)
        X = add_mix(c.X, alpha, c.P)
        R = add_mix(c.R, -alpha, Q)
        S_new, res, Z = S_res_z(R)
        beta = _solve_small_spd(c.S, S_new, eps)
        P = mix_P(Z, R, beta, c.P)
        done = jnp.all(res <= thresh)
        return _Carry(X, R, P, S_new, res, c.it + 1, done)

    init = _Carry(Xk, R, P0, S0, res0, jnp.int32(0),
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
    Xout = (
        deinterleave_cols(final.X, plan, k, n).T if inter else final.X.T
    )
    return Xout, stats
