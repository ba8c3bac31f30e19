"""Deflation / two-level preconditioner (A-DEF2).

Beyond-reference addition: the reference's multilevel story stops at AMG
(src/preconditioner/amg.rs); production Krylov frameworks also ship
*deflation* — remove a handful of known troublesome modes (near-kernel
vectors, rigid-body modes, eigenvectors from a previous solve) with a
small Galerkin coarse correction layered over ANY existing smoother.

This implements A-DEF2 (Tang, Nabben, Vuik & Erlangga, J. Sci. Comput.
39, 2009 — the robust choice in their comparison of 13 deflation /
coarse-correction variants):

    M_ADEF2 = P^T M + Q,   Q = W E^{-1} W^T,   E = W^T A W,   P = I - A Q

so for symmetric A the apply is

    z = M r + W E^{-1} (W^T r - (A W)^T M r)

— TPU-cost: one apply of the inner M, two tall-skinny (n, k) matmuls on
the MXU, and ONE fused reduction for both small projections (the
``fused_dots`` pattern); ``A W`` and the Cholesky factor of E are cached
at setup, so NO extra A-matvec per iteration.

Pairs naturally with :func:`kryst_tpu.solvers.lobpcg.lobpcg`: compute the
lowest k eigenvectors once, then deflate them from every subsequent PCG
solve (the classic sequence-of-solves production pattern).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array, lax
from jax.tree_util import register_dataclass

from kryst_tpu.core.linop import as_operator


@dataclasses.dataclass(frozen=True)
class DeflationPC:
    """A-DEF2 two-level preconditioner state (pytree).

    ``W``: (n, k) deflation basis; ``AW``: cached A @ W; ``L``: Cholesky
    factor of E = W^T A W; ``inner``: any PC state with ``.apply`` or
    None (identity smoother); ``axis_name``: mesh axis for the small
    projections (rows of W sharded like the solver vectors).
    """

    W: Array
    AW: Array
    L: Array
    inner: object = None
    axis_name: Optional[str] = None
    AtW: Optional[Array] = None  # cached A^T W for nonsymmetric A

    def apply(self, r: Array) -> Array:
        z1 = r if self.inner is None else self.inner.apply(r)
        # both k-vectors in ONE reduction: [W | AtW]^T [r | z1] pairings.
        # The correction needs W^T A z1 = (A^T W)^T z1; for symmetric A
        # that is (AW)^T z1, for nonsymmetric A setup() caches A^T W.
        AtW = self.AW if self.AtW is None else self.AtW
        proj = jnp.concatenate([self.W.T @ r, AtW.T @ z1])
        if self.axis_name is not None:
            proj = lax.psum(proj, self.axis_name)
        k = self.W.shape[1]
        f = proj[:k] - proj[k:]
        e = jax.scipy.linalg.cho_solve((self.L, True), f)
        return z1 + self.W @ e

    def partition_spec(self, axis: str):
        """Mesh layout (see parallel/sharded.py::_m_specs): the (n, k)
        bases shard by ROW like the solver vectors, the small Cholesky
        factor replicates, the inner PC recurses."""
        from jax.sharding import PartitionSpec as P

        inner_spec = None
        if self.inner is not None:
            from kryst_tpu.parallel.sharded import _m_specs

            inner_spec = _m_specs(self.inner, axis)
        return DeflationPC(
            W=P(axis, None), AW=P(axis, None), L=P(), inner=inner_spec,
            axis_name=self.axis_name,
            AtW=None if self.AtW is None else P(axis, None),
        )

    @staticmethod
    def setup(A, W, inner=None, axis_name: Optional[str] = None,
              shift: float = 0.0) -> "DeflationPC":
        """Build from an operator and an (n, k) basis.

        A-DEF2's analysis assumes SPD A; that is the supported setting.
        For a NONSYMMETRIC operator exposing ``rmatvec``, ``A^T W`` is
        cached here so apply() still computes the exact Galerkin
        correction term ``W^T A z1``; without ``rmatvec`` the symmetric
        substitution ``(AW)^T z1`` is used — then the result is merely a
        fixed linear preconditioner (solutions stay correct, but the
        two-level deflation property is lost).

        ``shift`` adds ``shift * I`` to E before factoring — a ridge for
        a nearly dependent basis (0 = exact Galerkin).
        """
        A = as_operator(A)
        W = jnp.asarray(W)
        if W.ndim == 1:
            W = W[:, None]
        AW = A.matvec_block(W) if hasattr(A, "matvec_block") else (
            jnp.stack([A.matvec(W[:, j]) for j in range(W.shape[1])], axis=1)
        )
        AtW = None
        if not bool(getattr(A, "symmetric", False)):
            try:
                AtW = jnp.stack(
                    [A.rmatvec(W[:, j]) for j in range(W.shape[1])], axis=1
                )
            except (NotImplementedError, AttributeError):
                AtW = None  # documented fallback: symmetric substitution
        E = W.T @ AW
        if axis_name is not None:
            E = lax.psum(E, axis_name)
        if shift:
            E = E + shift * jnp.eye(E.shape[0], dtype=E.dtype)
        L = jnp.linalg.cholesky(E)
        return DeflationPC(W=W, AW=AW, L=L, inner=inner,
                           axis_name=axis_name, AtW=AtW)


register_dataclass(
    DeflationPC,
    data_fields=["W", "AW", "L", "inner", "AtW"],
    meta_fields=["axis_name"],
)
