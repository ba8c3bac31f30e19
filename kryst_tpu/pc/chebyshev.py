"""Chebyshev polynomial preconditioner / smoother.

TPU-native redesign of the reference Chebyshev (src/preconditioner/
chebyshev.rs): z = p_m(A) r with the residual polynomial shaped by a
degree-m Chebyshev polynomial on the spectrum bound [emin, emax]
(chebyshev.rs:83-159). Pure matvec recurrence — no triangular solves, no
reductions — the most TPU-friendly preconditioner in the suite.

Improvements over the reference (documented):
- The reference's trait ``apply`` is a stub returning an error because the
  trait gives no matrix access (chebyshev.rs:67-70); here the operator is
  simply a field of the state pytree, so ChebyshevPC is a first-class
  preconditioner usable by every solver.
- Spectrum estimation was "future work" in the reference
  (chebyshev.rs:63-66); ``estimate_spectrum`` provides power-iteration
  bounds (the hypre/PETSc heuristic emin = emax/scale).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array, lax
from jax.tree_util import register_dataclass

from kryst_tpu.core.linop import as_operator


def chebyshev_apply(matvec, r: Array, emin, emax, degree: int) -> Array:
    """Chebyshev semi-iteration for A z ≈ r on [emin, emax] (Saad Alg 12.1).

    Shared by :class:`ChebyshevPC` and the per-shard additive-Schwarz local
    solve (parallel/sharded.py) — one recurrence, two matvec providers.
    """
    theta = (emax + emin) / 2.0
    delta = (emax - emin) / 2.0
    sigma1 = theta / delta
    rho = 1.0 / sigma1
    d = r / theta
    z = d
    res = r - matvec(z)

    def body(_, carry):
        z, res, d, rho = carry
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        d_new = rho_new * rho * d + (2.0 * rho_new / delta) * res
        z_new = z + d_new
        res_new = res - matvec(d_new)
        return (z_new, res_new, d_new, rho_new)

    z, _, _, _ = lax.fori_loop(0, degree - 1, body, (z, res, d, rho))
    return z


@dataclasses.dataclass(frozen=True)
class ChebyshevPC:
    A: object  # any LinearOperator pytree
    emin: Array
    emax: Array
    degree: int = dataclasses.field(metadata=dict(static=True))

    def apply(self, r: Array) -> Array:
        return chebyshev_apply(self.A.matvec, r, self.emin, self.emax, self.degree)

    @staticmethod
    def setup(
        A,
        degree: int = 10,
        emin: Optional[float] = None,
        emax: Optional[float] = None,
        emin_scale: float = 30.0,
        power_iters: int = 20,
        seed: int = 0,
    ) -> "ChebyshevPC":
        A = as_operator(A)
        if emax is None:
            emax_v = estimate_spectrum(A, iters=power_iters, seed=seed)
            emax_v = 1.1 * emax_v  # safety margin
        else:
            emax_v = jnp.asarray(emax, dtype=A.dtype)
        if emin is None:
            emin_v = emax_v / emin_scale
        else:
            emin_v = jnp.asarray(emin, dtype=A.dtype)
        return ChebyshevPC(A=A, emin=emin_v, emax=emax_v, degree=int(degree))


register_dataclass(ChebyshevPC, data_fields=["A", "emin", "emax"], meta_fields=["degree"])


def estimate_spectrum(A, iters: int = 20, seed: int = 0) -> Array:
    """Largest-eigenvalue estimate by power iteration (symmetric A)."""
    A = as_operator(A)
    n = A.shape[0]
    v = jax.random.normal(jax.random.PRNGKey(seed), (n,), dtype=A.dtype)
    v = v / jnp.linalg.norm(v)

    def body(_, carry):
        v, lam = carry
        w = A.matvec(v)
        lam = jnp.linalg.norm(w)
        return (w / jnp.maximum(lam, jnp.finfo(A.dtype).tiny), lam)

    _, lam = lax.fori_loop(0, iters, body, (v, jnp.ones((), dtype=A.dtype)))
    return lam


def chebyshev_t(m: int, x):
    """Chebyshev polynomial T_m by recurrence (chebyshev.rs:143-159)."""
    x = jnp.asarray(x)
    t0, t1 = jnp.ones_like(x), x
    if m == 0:
        return t0
    for _ in range(m - 1):
        t0, t1 = t1, 2 * x * t1 - t0
    return t1
