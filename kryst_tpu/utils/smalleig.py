"""Jit-safe small symmetric eigensolver (cyclic Jacobi rotations).

Why this exists: on the axon TPU backend, ``jnp.linalg.eigh`` inside a
jitted graph lowers through QDWH and takes tens of minutes to COMPILE
(measured; see CLAUDE.md), and host callbacks are unavailable — so any
algorithm needing an in-loop small dense eigendecomposition (LOBPCG's
Rayleigh-Ritz, Ritz shifts) cannot use it. Cyclic Jacobi is a few
hundred lines of plain VPU arithmetic: a ``lax.fori_loop`` over
(sweeps x pairs) of 2x2 rotations — compiles in seconds, converges
quadratically, and for the m <= ~100 matrices it is meant for the whole
solve costs microseconds.

Accuracy: ``sweeps=12`` drives off-diagonal mass to ~eps for m <= 100
(tested to 1e-12 in f64, ~1e-6 in f32 — the dtype's own precision).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax


@functools.partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh(S: Array, sweeps: int = 12):
    """Eigendecomposition of a symmetric (m, m) matrix by cyclic Jacobi.

    Returns ``(w, V)`` with eigenvalues ascending and ``S ≈ V @ diag(w)
    @ V.T`` — same contract as ``jnp.linalg.eigh``. ``m`` is a trace-time
    constant; intended for small m (Rayleigh-Ritz blocks, spectral
    bounds), NOT a LAPACK replacement.
    """
    m = S.shape[0]
    if m == 1:
        return S[0], jnp.ones((1, 1), S.dtype)
    # static pair schedule (row-cyclic)
    pq = np.array([(p, q) for p in range(m - 1) for q in range(p + 1, m)],
                  dtype=np.int32)
    pqs = jnp.asarray(np.tile(pq, (sweeps, 1)))

    def rotate(carry, pq_k):
        A, V = carry
        p, q = pq_k[0], pq_k[1]
        app = A[p, p]
        aqq = A[q, q]
        apq = A[p, q]
        # Rutishauser's stable rotation; skip (c=1, s=0) when apq == 0
        tau = (aqq - app) / jnp.where(apq == 0, 1.0, 2.0 * apq)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0, 1.0, t)  # sign(0) = 0 would zero the rotation
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        c = jnp.where(apq == 0, jnp.asarray(1.0, A.dtype), c)
        s = jnp.where(apq == 0, jnp.asarray(0.0, A.dtype), s)
        # A <- J^T A J, J = I except J[p,p]=c, J[q,q]=c, J[p,q]=s, J[q,p]=-s
        row_p = A[p]
        row_q = A[q]
        new_p = c * row_p - s * row_q
        new_q = s * row_p + c * row_q
        A = A.at[p].set(new_p).at[q].set(new_q)
        col_p = A[:, p]
        col_q = A[:, q]
        ncp = c * col_p - s * col_q
        ncq = s * col_p + c * col_q
        A = A.at[:, p].set(ncp).at[:, q].set(ncq)
        # exact zeros on the eliminated pair keep symmetry clean
        A = A.at[p, q].set(0.0).at[q, p].set(0.0)
        vp = V[:, p]
        vq = V[:, q]
        V = V.at[:, p].set(c * vp - s * vq).at[:, q].set(s * vp + c * vq)
        return (A, V), None

    A0 = (S + S.T) * 0.5
    V0 = jnp.eye(m, dtype=S.dtype)
    (A, V), _ = lax.scan(rotate, (A0, V0), pqs)
    w = jnp.diagonal(A)
    order = jnp.argsort(w)
    return w[order], V[:, order]
