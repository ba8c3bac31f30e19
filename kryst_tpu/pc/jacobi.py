"""Jacobi (diagonal) preconditioner.

Reference: src/preconditioner/jacobi.rs. The reference probes the diagonal
with n unit-vector matvecs — an O(n²) setup (jacobi.rs:53-73, quirk noted
in SURVEY §5.9). Here the diagonal is extracted directly from the operator
(``.diagonal()``) in O(nnz); the apply is the same element-wise scale
(jacobi.rs:78-95) and zero diagonal entries invert to 0 (jacobi.rs:69-71).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import Array
from jax.tree_util import register_dataclass

from kryst_tpu.core.linop import as_operator


@dataclasses.dataclass(frozen=True)
class JacobiPC:
    inv_diag: Array

    def apply(self, r: Array) -> Array:
        return self.inv_diag * r

    @staticmethod
    def setup(A) -> "JacobiPC":
        A = as_operator(A)
        d = A.diagonal()
        inv = jnp.where(d != 0, 1.0 / jnp.where(d != 0, d, 1.0), 0.0)
        return JacobiPC(inv_diag=inv)

    @staticmethod
    def from_diagonal(d) -> "JacobiPC":
        d = jnp.asarray(d)
        inv = jnp.where(d != 0, 1.0 / jnp.where(d != 0, d, 1.0), 0.0)
        return JacobiPC(inv_diag=inv)


register_dataclass(JacobiPC, data_fields=["inv_diag"], meta_fields=[])
