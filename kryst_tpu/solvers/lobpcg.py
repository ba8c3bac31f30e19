"""LOBPCG — locally optimal block preconditioned conjugate gradient
eigensolver (Knyazev 2001).

Beyond-reference capability: the reference ships no eigensolver, but a
production Krylov framework needs one — spectral bounds drive Chebyshev
setup, smoother weights, and CA-GMRES shifts, and "smallest eigenpairs of
an SPD operator" is the standard mesh/stability analysis ask. LOBPCG fits
this framework exactly: it is matvec + preconditioner-apply + small dense
Rayleigh-Ritz, i.e. the machinery every solver here already has.

TPU-native design points:
- the (3k, 3k) Rayleigh-Ritz eigenproblem uses the jit-safe cyclic-Jacobi
  kernel (utils/smalleig.py) — ``jnp.linalg.eigh`` inside jit lowers
  through QDWH on this backend and compiles for tens of minutes;
- basis conditioning is handled by SPECTRAL whitening (eigendecompose the
  Gram, damp directions below eps·λmax to zero columns, push their Ritz
  values to +BIG so they sort last) — rank-adaptive with static shapes,
  no dynamic column counts under jit;
- all Grams are ``psum``-aware (``axis_name``) so the solver runs
  unchanged on a sharded mesh.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array, lax

from kryst_tpu.core.linop import as_operator
from kryst_tpu.solvers._common import prepare_loop
from kryst_tpu.utils.smalleig import jacobi_eigh


class EigStats(NamedTuple):
    iterations: Array
    resnorms: Array  # (k,) final per-pair residual norms ||A x - w x||
    converged: Array


def _psum(x, axis_name):
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def _gram(U: Array, V: Array, axis_name) -> Array:
    return _psum(U.T @ V, axis_name)


def _apply_pc(M, R: Array) -> Array:
    if M is None:
        return R
    f = M.apply if hasattr(M, "apply") else M
    return jax.vmap(f, in_axes=1, out_axes=1)(R)


def lobpcg(
    A,
    X0: Array,
    M=None,
    *,
    tol: float = 1e-6,
    maxiter: int = 200,
    largest: bool = False,
    axis_name: Optional[str] = None,
):
    """k extreme eigenpairs of symmetric A. Returns ``(w, X, EigStats)``
    with ``w`` ascending (the smallest k by default; ``largest=True``
    selects the top of the spectrum instead).

    ``X0``: (n, k) initial block (random is fine). ``M``: optional
    preconditioner (state pytree with ``.apply`` or a callable), ideally
    ≈ A⁻¹ — e.g. ``GMGPC``/``AMGPC`` for smallest eigenpairs of a mesh
    Laplacian. Convergence: ``||A x_j - w_j x_j|| <= tol * max(|w_j|, 1)``
    for every pair.
    """
    A = prepare_loop(as_operator(A, dtype=jnp.asarray(X0).dtype))
    M = prepare_loop(M)
    X0 = jnp.asarray(X0)
    n, k = X0.shape
    eps = jnp.finfo(X0.dtype).eps

    def matvec_block(V):
        f = getattr(A, "matvec_block", None)
        if f is not None:
            return f(V)
        return jax.vmap(A.matvec, in_axes=1, out_axes=1)(V)

    def whiten(S):
        """Orthonormalize columns of S by spectral whitening; returns
        (B, dropped) where dropped marks zeroed (rank-deficient)
        columns."""
        O = _gram(S, S, axis_name)
        lam, Q = jacobi_eigh(O)
        lmax = jnp.maximum(lam[-1], 0.0)
        good = lam > (100.0 * eps) * jnp.maximum(lmax, eps)
        inv_sqrt = jnp.where(good, 1.0 / jnp.sqrt(jnp.where(good, lam, 1.0)), 0.0)
        T = Q * inv_sqrt[None, :]
        return S @ T, ~good

    def orth_block(V, prevs):
        """Project V off the (orthonormal) blocks in ``prevs`` (CGS2) and
        whiten what remains. The BLOCK structure of the basis must survive
        orthonormalization — a whitening of the concatenated [X W P] mixes
        the blocks, making the 'zero the X rows of Y' implicit-P update
        meaningless (measured: P collapses into span(X, W) every iteration
        and the method degenerates to steepest descent)."""
        for _ in range(2):
            for U in prevs:
                V = V - U @ _gram(U, V, axis_name)
        return whiten(V)

    def ritz(S, dropped):
        AB = matvec_block(S)
        G = _gram(S, AB, axis_name)
        G = (G + G.T) * 0.5
        big = 2.0 * jnp.sum(jnp.abs(G)) + 1.0
        sign = -1.0 if largest else 1.0
        # dropped directions are exact zero columns of S: push their Ritz
        # values out of the selected end of the spectrum
        G = G + jnp.diag(jnp.where(dropped, sign * big, 0.0))
        w, Y = jacobi_eigh(G)
        if largest:
            w, Y = w[::-1], Y[:, ::-1]
        return w[:k], Y[:, :k]

    class _Carry(NamedTuple):
        X: Array
        P: Array
        w: Array
        res: Array
        it: Array
        done: Array

    # iteration 0: Rayleigh-Ritz on X alone
    B0, drop0 = whiten(X0)
    w0, Y0 = ritz(B0, jnp.concatenate([drop0]))
    # ritz() sizes Y by k; for the k-column start this is the full basis
    X1 = B0 @ Y0
    R0 = matvec_block(X1) - X1 * w0[None, :]
    res0 = jnp.sqrt(jnp.maximum(_psum(jnp.sum(R0 * R0, axis=0), axis_name), 0.0))
    init = _Carry(
        X=X1, P=jnp.zeros_like(X1), w=w0, res=res0, it=jnp.int32(0),
        done=jnp.all(res0 <= tol * jnp.maximum(jnp.abs(w0), 1.0)),
    )

    def cond(s: _Carry):
        return (~s.done) & (s.it < maxiter)

    def body(s: _Carry) -> _Carry:
        R = matvec_block(s.X) - s.X * s.w[None, :]
        W = _apply_pc(M, R)
        # block-respecting orthonormal basis [X | W' | P']: W' ⟂ X,
        # P' ⟂ (X, W') — rank deficiency becomes exact zero columns
        Wb, dropw = orth_block(W, (s.X,))
        Pb, dropp = orth_block(s.P, (s.X, Wb))
        S = jnp.concatenate([s.X, Wb, Pb], axis=1)  # (n, 3k) orthonormal
        dropped = jnp.concatenate(
            [jnp.zeros(k, bool), dropw, dropp]
        )
        w, Y = ritz(S, dropped)
        X_new = S @ Y
        # implicit P: the new X's component outside the old X block —
        # legitimate exactly because the basis kept its block structure
        Yp = Y.at[:k, :].set(0.0)
        P_new = S @ Yp
        R_new = matvec_block(X_new) - X_new * w[None, :]
        res = jnp.sqrt(
            jnp.maximum(_psum(jnp.sum(R_new * R_new, axis=0), axis_name), 0.0)
        )
        done = jnp.all(res <= tol * jnp.maximum(jnp.abs(w), 1.0))
        return _Carry(X_new, P_new, w, res, s.it + 1, done)

    final = lax.while_loop(cond, body, init)
    stats = EigStats(
        iterations=final.it, resnorms=final.res, converged=final.done
    )
    return final.w, final.X, stats
