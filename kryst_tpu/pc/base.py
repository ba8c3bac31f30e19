"""Preconditioner protocol.

TPU-native version of the reference traits (src/preconditioner/mod.rs:8-19):

    Preconditioner::setup(&A)          ->  PC.setup(A_host_or_device) -> state
    Preconditioner::apply(r, &mut z)   ->  state.apply(r) -> z

Each preconditioner is a *pytree dataclass* holding the precomputed arrays
(inverse diagonals, factor triangles, hierarchies...), so it can be closed
over or passed through jit, and its ``apply`` is pure and traceable.

``FlexiblePreconditioner`` (preconditioner/mod.rs:15-19, used by FGMRES)
becomes a callable ``(iteration, v) -> z`` — under jit the *structure* must
be fixed, but the behavior may depend on the iteration index.
"""
from __future__ import annotations

from typing import Protocol, runtime_checkable

from jax import Array


@runtime_checkable
class Preconditioner(Protocol):
    def apply(self, r: Array) -> Array:  # pragma: no cover - protocol
        ...


class IdentityPC:
    """No-op preconditioner (PC::None analogue)."""

    def apply(self, r: Array) -> Array:
        return r


def apply_pc(M, r: Array) -> Array:
    return r if M is None else M.apply(r)
