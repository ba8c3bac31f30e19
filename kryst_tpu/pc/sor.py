"""SOR / SSOR / Gauss-Seidel smoother-preconditioner.

TPU-native redesign of the reference Sor (src/preconditioner/sor.rs):
``MatSorType`` sweep flags (sor.rs:32-44), omega / its / fshift parameters
(sor.rs:55-64), zero-pivot detection at setup (sor.rs:106-118), and
omega-weighted forward/backward sweeps (sor.rs:124-170).

Execution model: a sweep is a ``lax.scan`` over dependency levels
(pc/triangular.py). Sequential Gauss-Seidel semantics are preserved
exactly by splitting each row's neighbor sum into the in-sweep triangle
(reads progressively-updated z, level by level) and the counter-sweep
triangle (reads the sweep-start snapshot) — the same values the
reference's sequential loop reads, executed wavefront-parallel.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax import Array, lax
from jax.tree_util import register_dataclass

from kryst_tpu.matrix.csr import CSRMatrix
from kryst_tpu.ops.spmv import ell_spmv
from kryst_tpu.pc.triangular import lower_factor_from_csr, upper_factor_from_csr


class SweepType(enum.Flag):
    """Sweep selection (reference MatSorType bitflags, sor.rs:32-44)."""

    FORWARD = enum.auto()  # APPLY_LOWER
    BACKWARD = enum.auto()  # APPLY_UPPER
    SYMMETRIC = FORWARD | BACKWARD  # SYMMETRIC_SWEEP
    ZERO_INITIAL_GUESS = enum.auto()


@dataclasses.dataclass(frozen=True)
class SORPC:
    """State: strict triangles of A in level-scheduled ELL form + diagonal."""

    Ldata: Array
    Lcols: Array
    Llevels: Array
    Udata: Array
    Ucols: Array
    Ulevels: Array
    diag: Array  # shifted diagonal d + fshift
    omega: float = dataclasses.field(metadata=dict(static=True))
    its: int = dataclasses.field(metadata=dict(static=True))
    sweep: SweepType = dataclasses.field(metadata=dict(static=True))

    def _forward_sweep(self, z: Array, r: Array) -> Array:
        """One in-place forward SOR sweep: z_i ← (1-ω)z_i + ω/d_i (r_i - Σ_{j<i} a_ij z_j^{new} - Σ_{j>i} a_ij z_j^{old})."""
        u_contrib = ell_spmv(self.Udata, self.Ucols, z)  # counter-sweep snapshot
        z_old = z

        n = self.diag.shape[0]

        def step(z, rows):
            valid = rows >= 0
            rr = jnp.where(valid, rows, 0)
            lsum = (self.Ldata[rr] * z[self.Lcols[rr]]).sum(axis=1)
            zi = (1.0 - self.omega) * z_old[rr] + self.omega / self.diag[rr] * (
                r[rr] - lsum - u_contrib[rr]
            )
            # padded lanes scatter out of bounds (dropped) — see triangular.py
            return z.at[jnp.where(valid, rows, n)].set(zi, mode="drop"), None

        z, _ = lax.scan(step, z, self.Llevels)
        return z

    def _backward_sweep(self, z: Array, r: Array) -> Array:
        l_contrib = ell_spmv(self.Ldata, self.Lcols, z)
        z_old = z

        n = self.diag.shape[0]

        def step(z, rows):
            valid = rows >= 0
            rr = jnp.where(valid, rows, 0)
            usum = (self.Udata[rr] * z[self.Ucols[rr]]).sum(axis=1)
            zi = (1.0 - self.omega) * z_old[rr] + self.omega / self.diag[rr] * (
                r[rr] - usum - l_contrib[rr]
            )
            return z.at[jnp.where(valid, rows, n)].set(zi, mode="drop"), None

        z, _ = lax.scan(step, z, self.Ulevels)
        return z

    def smooth(self, r: Array, z0: Optional[Array] = None) -> Array:
        """Run ``its`` sweeps starting from ``z0`` (or zero)."""
        z = jnp.zeros_like(r) if z0 is None else z0
        for _ in range(self.its):
            if self.sweep & SweepType.FORWARD:
                z = self._forward_sweep(z, r)
            if self.sweep & SweepType.BACKWARD:
                z = self._backward_sweep(z, r)
        return z

    def apply(self, r: Array) -> Array:
        return self.smooth(r)

    @staticmethod
    def setup(
        a: CSRMatrix,
        omega: float = 1.0,
        its: int = 1,
        fshift: float = 0.0,
        sweep: SweepType = SweepType.SYMMETRIC,
        dtype=None,
    ) -> "SORPC":
        dtype = dtype or a.data.dtype
        d = a.diag().astype(dtype) + fshift
        if np.any(d == 0):  # sor.rs:112-114 ZeroPivot
            raise ZeroDivisionError("SOR setup: zero (shifted) diagonal entry")
        L = lower_factor_from_csr(a, unit_diag=True, dtype=dtype)
        U = upper_factor_from_csr(a, unit_diag=True, dtype=dtype)
        return SORPC(
            Ldata=L.data, Lcols=L.cols, Llevels=L.levels,
            Udata=U.data, Ucols=U.cols, Ulevels=U.levels,
            diag=jnp.asarray(d),
            omega=float(omega), its=int(its), sweep=sweep,
        )

    def __repr__(self) -> str:  # Display impl analogue (sor.rs:87-95)
        return (
            f"SORPC(omega={self.omega}, its={self.its}, sweep={self.sweep}, "
            f"n={self.diag.shape[0]})"
        )


register_dataclass(
    SORPC,
    data_fields=["Ldata", "Lcols", "Llevels", "Udata", "Ucols", "Ulevels", "diag"],
    meta_fields=["omega", "its", "sweep"],
)


@dataclasses.dataclass(frozen=True)
class MulticolorSORPC:
    """Multicolor (e.g. red-black) SOR — the gather-free TPU smoother.

    The reference reserves ``PC::Multicolor`` for exactly this
    (pc_context.rs:64, unimplemented there; coloring.rs provides the
    coloring). Updating one color with all other colors at their latest
    values is Gauss-Seidel in the color ordering, and it can be written as
    a *masked Jacobi step*:

        z <- z + mask_c * omega * D^-1 (r - A z)

    i.e. one full DIA matvec per color per sweep — no triangular solve, no
    wavefront latency, no gathers. For 5/7-point stencils two colors
    suffice, so a sweep costs 2 SpMVs. Update ORDER differs from the
    lexicographic reference sweep (the standard, documented multicolor
    trade).
    """

    A: object  # DIAOperator
    inv_diag: Array
    color_masks: Array  # (ncolors, n) in {0,1}
    omega: float = dataclasses.field(metadata=dict(static=True))
    its: int = dataclasses.field(metadata=dict(static=True))
    symmetric: bool = dataclasses.field(default=True, metadata=dict(static=True))

    def apply(self, r: Array) -> Array:
        z = jnp.zeros_like(r)
        nc = self.color_masks.shape[0]
        order = list(range(nc))
        sweeps = order + order[::-1] if self.symmetric else order
        for _ in range(self.its):
            for c in sweeps:
                z = z + self.color_masks[c] * (
                    self.omega * self.inv_diag * (r - self.A.matvec(z))
                )
        return z

    @staticmethod
    def setup(
        a: CSRMatrix,
        omega: float = 1.0,
        its: int = 1,
        symmetric: bool = True,
        dtype=None,
    ) -> "MulticolorSORPC":
        from kryst_tpu.ops.dia import csr_to_dia
        from kryst_tpu.pc.coloring import color_graph

        dtype = dtype or a.data.dtype
        colors = color_graph(a, distance=1)
        ncolors = int(colors.max()) + 1
        masks = np.stack(
            [(colors == c).astype(dtype) for c in range(ncolors)]
        )
        d = a.diag().astype(dtype)
        if np.any(d == 0):
            raise ZeroDivisionError("MulticolorSOR setup: zero diagonal entry")
        return MulticolorSORPC(
            A=csr_to_dia(a, dtype=dtype),
            inv_diag=jnp.asarray((1.0 / d).astype(dtype)),
            color_masks=jnp.asarray(masks),
            omega=float(omega),
            its=int(its),
            symmetric=symmetric,
        )


register_dataclass(
    MulticolorSORPC,
    data_fields=["A", "inv_diag", "color_masks"],
    meta_fields=["omega", "its", "symmetric"],
)


def gauss_seidel(a: CSRMatrix, its: int = 1, **kw) -> SORPC:
    """Forward Gauss-Seidel = SOR with omega=1."""
    return SORPC.setup(a, omega=1.0, its=its, sweep=SweepType.FORWARD, **kw)


def ssor(a: CSRMatrix, omega: float = 1.0, its: int = 1, **kw) -> SORPC:
    return SORPC.setup(a, omega=omega, its=its, sweep=SweepType.SYMMETRIC, **kw)
