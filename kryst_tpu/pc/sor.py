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
    #: first half-sweep assumes z = 0: skips the counter-triangle SpMV and
    #: the (1-omega) z term (an exact algebraic shortcut, not an approximation)
    ZERO_INITIAL_GUESS = enum.auto()
    #: marker consumed by the api layer: SSOR via Eisenstat's trick
    #: (sor.rs:42 EISENSTAT — a flag with no implementation in the
    #: reference; see :class:`EisenstatSSOR` for the real thing)
    EISENSTAT = enum.auto()


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

    def _forward_sweep(self, z: Array, r: Array, z_is_zero: bool = False) -> Array:
        """One in-place forward SOR sweep: z_i ← (1-ω)z_i + ω/d_i (r_i - Σ_{j<i} a_ij z_j^{new} - Σ_{j>i} a_ij z_j^{old}).

        ``z_is_zero``: caller guarantees z == 0, so the counter-sweep SpMV
        and the (1-ω)z term vanish exactly (ZERO_INITIAL_GUESS shortcut).
        """
        if z_is_zero:
            u_contrib = jnp.zeros_like(z)
        else:
            u_contrib = ell_spmv(self.Udata, self.Ucols, z)  # counter-sweep snapshot
        z_old = z

        n = self.diag.shape[0]

        def step(z, rows):
            valid = rows >= 0
            rr = jnp.where(valid, rows, 0)
            lsum = (self.Ldata[rr] * z[self.Lcols[rr]]).sum(axis=1)
            zi = self.omega / self.diag[rr] * (r[rr] - lsum - u_contrib[rr])
            if not z_is_zero:
                zi = (1.0 - self.omega) * z_old[rr] + zi
            # padded lanes scatter out of bounds (dropped) — see triangular.py
            return z.at[jnp.where(valid, rows, n)].set(zi, mode="drop"), None

        z, _ = lax.scan(step, z, self.Llevels)
        return z

    def _backward_sweep(self, z: Array, r: Array, z_is_zero: bool = False) -> Array:
        if z_is_zero:
            l_contrib = jnp.zeros_like(z)
        else:
            l_contrib = ell_spmv(self.Ldata, self.Lcols, z)
        z_old = z

        n = self.diag.shape[0]

        def step(z, rows):
            valid = rows >= 0
            rr = jnp.where(valid, rows, 0)
            usum = (self.Udata[rr] * z[self.Ucols[rr]]).sum(axis=1)
            zi = self.omega / self.diag[rr] * (r[rr] - usum - l_contrib[rr])
            if not z_is_zero:
                zi = (1.0 - self.omega) * z_old[rr] + zi
            return z.at[jnp.where(valid, rows, n)].set(zi, mode="drop"), None

        z, _ = lax.scan(step, z, self.Ulevels)
        return z

    def smooth(self, r: Array, z0: Optional[Array] = None) -> Array:
        """Run ``its`` sweeps starting from ``z0`` (or zero)."""
        z = jnp.zeros_like(r) if z0 is None else z0
        # ZERO_INITIAL_GUESS: the very first half-sweep runs on a known-zero
        # z, saving one counter-triangle SpMV (exact, not approximate)
        first_zero = z0 is None and bool(self.sweep & SweepType.ZERO_INITIAL_GUESS)
        for _ in range(self.its):
            if self.sweep & SweepType.FORWARD:
                z = self._forward_sweep(z, r, z_is_zero=first_zero)
                first_zero = False
            if self.sweep & SweepType.BACKWARD:
                z = self._backward_sweep(z, r, z_is_zero=first_zero)
                first_zero = False
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
        if sweep & SweepType.EISENSTAT:
            raise ValueError(
                "the Eisenstat trick restructures the Krylov iteration and "
                "cannot be a PC apply: use pc.sor.eisenstat_cg / EisenstatSSOR"
            )
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


# ---------------------------------------------------------------------------
# Eisenstat's trick (reference MatSorType::EISENSTAT, sor.rs:42 — a declared
# flag the reference never implements)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class EisenstatSSOR:
    """SSOR-preconditioned operator via Eisenstat's trick — matvec-free.

    With A = L + D + U, D̂ = D/ω and S = D̂^{1/2}, the symmetrically
    transformed system

        Â y = b̂,   Â = S (D̂+L)⁻¹ A (D̂+U)⁻¹ S,
        b̂ = S (D̂+L)⁻¹ b,   x = (D̂+U)⁻¹ S y

    is (up to the scalar ω/(2-ω), which cancels in any Krylov method)
    the split-SSOR-preconditioned system. Eisenstat's identity
    A = (D̂+L) + (D̂+U) - γD with γ = 2/ω - 1 turns the Â matvec into

        t = (D̂+U)⁻¹ S v;   Â v = S (t + (D̂+L)⁻¹ (S v - γ D t))

    — ONE lower + ONE upper triangular solve and NO A-matvec. A plain
    SSOR-PCG iteration costs matvec + lower + upper: on this TPU, where
    each wavefront level is ~25 µs of launch overhead and the matvec is
    the bandwidth hog, the trick removes the matvec entirely.

    For SPD A (U = Lᵀ, positive diagonal), Â is SPD, so plain :func:`cg`
    applies; use :func:`eisenstat_cg` for the full solve-transform-recover
    round trip. Convergence matches SSOR-PCG.
    """

    Lfac: object  # TriangularFactor: strict lower + diag D̂
    Ufac: object  # TriangularFactor: strict upper + diag D̂
    gamma_d: Array  # γ·D
    s: Array  # D̂^{1/2}

    @property
    def dtype(self):
        return self.s.dtype

    def matvec(self, v: Array) -> Array:
        sv = self.s * v
        t = self.Ufac.solve(sv)
        w = self.Lfac.solve(sv - self.gamma_d * t)
        return self.s * (t + w)

    def transform_rhs(self, b: Array) -> Array:
        return self.s * self.Lfac.solve(b)

    def recover(self, y: Array) -> Array:
        return self.Ufac.solve(self.s * y)

    @staticmethod
    def setup(a: CSRMatrix, omega: float = 1.0, dtype=None) -> "EisenstatSSOR":
        if not (0.0 < omega < 2.0):
            raise ValueError(f"SSOR needs 0 < omega < 2, got {omega}")
        dtype = dtype or a.data.dtype
        d = np.asarray(a.diag(), dtype=np.float64)
        if np.any(d <= 0):
            raise ValueError(
                "EisenstatSSOR requires a positive diagonal (SPD A); "
                "use SORPC for the general sweep preconditioner"
            )
        d_hat = d / omega
        gamma = 2.0 / omega - 1.0
        L = lower_factor_from_csr(a, unit_diag=False, diag=d_hat, dtype=dtype)
        U = upper_factor_from_csr(a, unit_diag=False, diag=d_hat, dtype=dtype)
        return EisenstatSSOR(
            Lfac=L,
            Ufac=U,
            gamma_d=jnp.asarray((gamma * d).astype(dtype)),
            s=jnp.asarray(np.sqrt(d_hat).astype(dtype)),
        )


register_dataclass(
    EisenstatSSOR, data_fields=["Lfac", "Ufac", "gamma_d", "s"], meta_fields=[]
)


def eisenstat_cg(
    a: CSRMatrix, b, x0=None, *, omega: float = 1.0, dtype=None, **cg_kw
):
    """CG on the Eisenstat-transformed SSOR system: the SSOR-PCG answer at
    ~2/3 the per-iteration cost (no A-matvec). Returns ``(x, SolveStats)``;
    stats measure the transformed system (the split-SSOR-preconditioned
    residual norm), as split-preconditioned solvers conventionally do.
    """
    from kryst_tpu.solvers.cg import cg

    E = EisenstatSSOR.setup(a, omega=omega, dtype=dtype)
    bhat = E.transform_rhs(jnp.asarray(b))
    y0 = None
    if x0 is not None:
        # map the initial guess into transformed space: y0 = S^-1 (D̂+U) x0
        x0 = jnp.asarray(x0)
        y0 = (ell_spmv(E.Ufac.data, E.Ufac.cols, x0) + E.s * E.s * x0) / E.s
    y, stats = cg(E, bhat, y0, **cg_kw)
    return E.recover(y), stats
