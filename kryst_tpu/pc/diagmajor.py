"""Exact lexicographic triangular solves in antidiagonal-major form.

VERDICT r2 item 4. The level-scheduled wavefront solve (pc/triangular.py)
is EXACT but latency-bound on TPU: each of ~2*grid levels pays a gather +
scatter step (~25 us measured), so an exact ILU(0) apply at 256^2 costs
~500 levels of launch latency. On a structured 2-D 5-point grid the
wavefronts are the ANTIdiagonals i+j = d, and every dependency of level d
lives at level d-1, at packed positions i and i-1 — so if the vector is
stored antidiagonal-major, each wavefront step is two CONTIGUOUS shifted
slices and a fused multiply-add: zero gathers, ~6 VPU ops per level inside
one ``lax.scan``.

The antidiagonal-major permutation itself is gather-free: skewing
``X[i, j] -> Y[i, i+j]`` is a pad + flat reshape with row stride
``nx+ny-1`` (the classic as-strided skew), so pack/unpack cost two
reshapes, not an n-element gather (XLA gathers run at ~0.13 Gelem/s on
this TPU — a 65k-element permutation would cost ~0.5 ms, dwarfing the
solve).

Exactness: identical arithmetic to sequential lexicographic substitution
(reference src/preconditioner/ilu.rs:105-122, sor.rs:124-170) — rows
within an antidiagonal are independent, so only the summation order
within a row could differ, and a 5-point row has at most two strict-
triangle terms: the sums are literally the same. Parity is tested
against the NumPy exact oracle (tests/test_diagmajor.py).

Scope: 2-D 5-point and 3-D 7-point patterns (Poisson, convection-
diffusion; ILU(0) factors of such matrices keep the pattern). The 3-D
variant packs wavefront planes i+j+k = d by applying the same skew trick
twice (batched over the leading axis).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from jax import Array, lax
from jax.tree_util import register_dataclass

from kryst_tpu.matrix.csr import CSRMatrix

# Antidiagonal levels processed per lax.scan step (see
# DiagMajorTriangular2D.solve_packed). 16 amortizes the measured ~1.4 us
# per-step overhead to <0.1 us/level while keeping compile size modest.
_UNROLL = 16

# solve_packed statically unrolls its level blocks up to this many scan
# steps (~_UNROLL*6 HLO ops each; 128 steps ~ 12k ops compiles fine);
# beyond it the lax.scan form bounds compile time for huge grids
_UNROLL_MAX_STEPS = 128


def skew_pack(X: Array) -> Array:
    """(nx, ny) -> (nx+ny-1, nx) with out[d, i] = X[i, d - i] (else 0).

    Pure pad + reshape + transpose: flat index of the padded array at
    [i, d-i] is i*(nx+ny-1) + d, so reshaping the flat buffer with row
    length nx+ny-1 lands antidiagonal d in column d. Out-of-band slots
    read the zero padding by construction.
    """
    nx, ny = X.shape
    P = jnp.pad(X, ((0, 0), (0, nx)))  # (nx, ny+nx)
    flat = P.reshape(-1)[: nx * (nx + ny - 1)]
    return flat.reshape(nx, nx + ny - 1).T


def skew_unpack(Yt: Array, nx: int, ny: int) -> Array:
    """Inverse of :func:`skew_pack`: (nx+ny-1, nx) -> (nx, ny)."""
    flat = Yt.T.reshape(-1)
    flat = jnp.pad(flat, (0, nx))
    return flat.reshape(nx, nx + ny)[:, :ny]


def skew_pack_np(X: np.ndarray) -> np.ndarray:
    """Host-side pack for setup-time coefficient planes."""
    nx, ny = X.shape
    out = np.zeros((nx + ny - 1, nx), dtype=X.dtype)
    for i in range(nx):
        out[i : i + ny, i] = X[i]
    return out


@dataclasses.dataclass(frozen=True)
class DiagMajorTriangular2D:
    """One triangular factor of a 5-point 2-D grid operator, stored
    antidiagonal-major.

    Lower (lexicographic forward): solves ``(D + C_ax S_ax + C_un S_un)
    x = b`` where ``S_ax`` shifts by one grid ROW (matrix offset -ny,
    packed read at position i-1 of the previous level) and ``S_un`` by
    one grid COLUMN (offset -1, packed position i). Upper mirrors with
    offsets +ny / +1 and a reversed scan. ``dinv`` is 1/diag packed
    (zero outside the band — padded lanes solve to exactly 0); unit-
    diagonal factors pass dinv = banded ones.
    """

    # Coefficients are stored PRE-BLOCKED as (nsteps, K=_UNROLL, nx) at
    # construction (DiagMajorTriangular2D.build): blocking them per
    # apply would copy 3 full arrays inside the solver's while_loop,
    # where re-layouts are NOT hoisted (CLAUDE.md; r3 review follow-up).
    c_ax: Array  # blocked coeff of the +-ny neighbor
    c_un: Array  # blocked coeff of the +-1 neighbor
    dinv: Array  # blocked 1/diag, 0 outside the band
    grid: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    lower: bool = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def build(cls, c_ax: Array, c_un: Array, dinv: Array, grid, lower):
        """Construct from FLAT (nlev, nx) packed coefficients."""
        nlev = c_ax.shape[0]
        K = min(_UNROLL, nlev)
        nsteps = -(-nlev // K)
        pad = nsteps * K - nlev

        def blk(a):
            # zero-pad the level axis; padded levels have all-zero
            # coefficients AND dinv, so they solve to exactly 0
            return jnp.pad(a, ((0, pad), (0, 0))).reshape(nsteps, K, -1)

        return cls(
            c_ax=blk(c_ax), c_un=blk(c_un), dinv=blk(dinv),
            grid=tuple(grid), lower=lower,
        )

    def solve_packed(self, B: Array) -> Array:
        """B: (nlev, nx) packed rhs -> packed solution.

        Levels are processed in ``_UNROLL``-level blocks, STATICALLY
        unrolled (a Python loop + one stack at the end) up to
        ``_UNROLL_MAX_STEPS`` blocks, falling back to ``lax.scan`` for
        huge grids. Why: the wavefront solve is dependency-latency
        bound — 2*(nx+ny-1) sequential ~6-op fusions at ~0.15 us each
        (a pure 1022-op dependency chain measures 150.6 us on this v5e,
        tools/tpu_r5_stage7.py) — and the scan machinery DOUBLES it
        (284.5 us scan vs 156.6 unrolled per ILU apply at 256^2: each
        scan step pays the stacked-ys output-buffer pass, the round-4
        finding). Identical arithmetic and order either way — the two
        forms are bitwise-equal (asserted on-chip, stage 7)."""
        nx = self.grid[0]
        zero = jnp.zeros((1,), dtype=B.dtype)
        nlev = B.shape[0]
        K = min(_UNROLL, nlev)
        nsteps = -(-nlev // K)
        pad = nsteps * K - nlev
        Bb = jnp.pad(B, ((0, pad), (0, 0))).reshape(nsteps, K, -1)
        cab, cub, dib = self.c_ax, self.c_un, self.dinv  # pre-blocked
        order = range(K) if self.lower else range(K - 1, -1, -1)

        if self.lower:

            def substep(x, b, ca, cu, di):
                x_ax = jnp.concatenate([zero, x[:-1]])  # position i-1
                return (b - ca * x_ax - cu * x) * di

        else:

            def substep(x, b, ca, cu, di):
                x_ax = jnp.concatenate([x[1:], zero])  # position i+1
                return (b - ca * x_ax - cu * x) * di

        if nsteps <= _UNROLL_MAX_STEPS:
            steps = range(nsteps) if self.lower else range(nsteps - 1, -1, -1)
            x = jnp.zeros((nx,), dtype=B.dtype)
            out = [None] * nsteps
            for si in steps:
                rows = [None] * K
                for k in order:
                    x = substep(x, Bb[si, k], cab[si, k], cub[si, k],
                                dib[si, k])
                    rows[k] = x
                out[si] = jnp.stack(rows)
            X = jnp.stack(out)
            return X.reshape(nsteps * K, -1)[:nlev]

        def step(x, inp):
            b, ca, cu, di = inp
            rows = [None] * K
            for k in order:
                x = substep(x, b[k], ca[k], cu[k], di[k])
                rows[k] = x
            return x, jnp.stack(rows)

        init = jnp.zeros((nx,), dtype=B.dtype)
        _, X = lax.scan(
            step, init, (Bb, cab, cub, dib), reverse=not self.lower
        )
        return X.reshape(nsteps * K, -1)[:nlev]

    def solve(self, b: Array) -> Array:
        nx, ny = self.grid
        B = skew_pack(b.reshape(nx, ny))
        return skew_unpack(self.solve_packed(B), nx, ny).reshape(nx * ny)


register_dataclass(
    DiagMajorTriangular2D,
    data_fields=["c_ax", "c_un", "dinv"],
    meta_fields=["grid", "lower"],
)


@dataclasses.dataclass(frozen=True)
class DiagMajorILU2D:
    """Exact ILU(0) apply for 5-point 2-D grid matrices at TPU speed:
    z = U^{-1} L^{-1} r with both solves as antidiagonal scans. Same
    factorization as :func:`kryst_tpu.pc.ilu.ilu0`; same arithmetic as
    its level-scheduled apply (reference ilu.rs:105-122) without the
    per-level gather/scatter latency."""

    L: DiagMajorTriangular2D
    U: DiagMajorTriangular2D

    def apply(self, r: Array) -> Array:
        nx, ny = self.L.grid
        B = skew_pack(r.reshape(nx, ny))
        Y = self.L.solve_packed(B)
        X = self.U.solve_packed(Y)
        return skew_unpack(X, nx, ny).reshape(nx * ny)

    @staticmethod
    def setup(a: CSRMatrix, grid: Tuple[int, int], dtype=None) -> "DiagMajorILU2D":
        """Factor (host IKJ, shared with ilu0) and pack. ``a`` must have
        the 5-point pattern on ``grid = (nx, ny)`` lexicographic order;
        raises otherwise."""
        from kryst_tpu.pc.ilu import _csr_to_rowdicts, _factor_ikj

        nx, ny = grid
        n = nx * ny
        if a.shape[0] != n:
            raise ValueError(f"grid {grid} does not match matrix n={a.shape[0]}")
        dtype = dtype or a.data.dtype
        rows = _factor_ikj(_csr_to_rowdicts(a), n)
        cN = np.zeros((nx, ny))  # L coeff at (i-1, j): matrix col k - ny
        cW = np.zeros((nx, ny))  # L coeff at (i, j-1): col k - 1
        cS = np.zeros((nx, ny))  # U coeff at (i+1, j): col k + ny
        cE = np.zeros((nx, ny))  # U coeff at (i, j+1): col k + 1
        dg = np.zeros((nx, ny))
        for k, row in enumerate(rows):
            i, j = divmod(k, ny)
            for c, v in row.items():
                if c == k - ny:
                    cN[i, j] = v
                elif c == k - 1 and j > 0:
                    cW[i, j] = v
                elif c == k + ny:
                    cS[i, j] = v
                elif c == k + 1 and j < ny - 1:
                    cE[i, j] = v
                elif c == k:
                    dg[i, j] = v
                else:
                    raise ValueError(
                        f"entry ({k},{c}) outside the 5-point pattern on "
                        f"grid {grid}; DiagMajorILU2D requires it"
                    )
        ones = skew_pack_np(np.ones((nx, ny))).astype(dtype)
        dinv = skew_pack_np(
            np.where(dg != 0, 1.0 / np.where(dg != 0, dg, 1.0), 0.0)
        ).astype(dtype)
        L = DiagMajorTriangular2D.build(
            c_ax=jnp.asarray(skew_pack_np(cN).astype(dtype)),
            c_un=jnp.asarray(skew_pack_np(cW).astype(dtype)),
            dinv=jnp.asarray(ones),  # unit diagonal
            grid=grid, lower=True,
        )
        U = DiagMajorTriangular2D.build(
            c_ax=jnp.asarray(skew_pack_np(cS).astype(dtype)),
            c_un=jnp.asarray(skew_pack_np(cE).astype(dtype)),
            dinv=jnp.asarray(dinv),
            grid=grid, lower=False,
        )
        return DiagMajorILU2D(L=L, U=U)


register_dataclass(DiagMajorILU2D, data_fields=["L", "U"], meta_fields=[])


@dataclasses.dataclass(frozen=True)
class DiagMajorSOR2D:
    """Exact lexicographic SOR/SSOR sweeps for 5-point 2-D grids.

    Forward sweep (reference MatSorType semantics, sor.rs:124-170):
    ``x += (D/omega + L)^{-1} (b - A x)`` — the triangular solve is the
    antidiagonal scan, A's matvec is the caller's operator. ``sweep`` in
    {"forward", "backward", "symmetric"}; ``its`` Richardson sweeps from
    x = 0, exactly :class:`kryst_tpu.pc.sor.SORPC`'s semantics.
    """

    Lfac: DiagMajorTriangular2D  # (D/omega + L)
    Ufac: DiagMajorTriangular2D  # (D/omega + U)
    A: object  # device operator for the residual matvec
    its: int = dataclasses.field(metadata=dict(static=True))
    sweep: str = dataclasses.field(metadata=dict(static=True))

    def apply(self, r: Array) -> Array:
        nx, ny = self.Lfac.grid
        x = jnp.zeros_like(r)
        for _ in range(self.its):
            if self.sweep in ("forward", "symmetric"):
                res = r - self.A.matvec(x)
                B = skew_pack(res.reshape(nx, ny))
                x = x + skew_unpack(
                    self.Lfac.solve_packed(B), nx, ny
                ).reshape(nx * ny)
            if self.sweep in ("backward", "symmetric"):
                res = r - self.A.matvec(x)
                B = skew_pack(res.reshape(nx, ny))
                x = x + skew_unpack(
                    self.Ufac.solve_packed(B), nx, ny
                ).reshape(nx * ny)
        return x

    @staticmethod
    def setup(
        a: CSRMatrix, grid: Tuple[int, int], omega: float = 1.0,
        its: int = 1, sweep: str = "symmetric", dtype=None, A_device=None,
    ) -> "DiagMajorSOR2D":
        nx, ny = grid
        n = nx * ny
        if a.shape[0] != n:
            raise ValueError(f"grid {grid} does not match matrix n={a.shape[0]}")
        dtype = dtype or a.data.dtype
        cN = np.zeros((nx, ny)); cW = np.zeros((nx, ny))
        cS = np.zeros((nx, ny)); cE = np.zeros((nx, ny))
        dg = np.zeros((nx, ny))
        for k in range(n):
            i, j = divmod(k, ny)
            cols, vals = a.row(k)
            for c, v in zip(cols.tolist(), vals.tolist()):
                if c == k - ny:
                    cN[i, j] = v
                elif c == k - 1 and j > 0:
                    cW[i, j] = v
                elif c == k + ny:
                    cS[i, j] = v
                elif c == k + 1 and j < ny - 1:
                    cE[i, j] = v
                elif c == k:
                    dg[i, j] = v
                else:
                    raise ValueError(
                        f"entry ({k},{c}) outside the 5-point pattern"
                    )
        if (dg == 0).any():
            raise ZeroDivisionError("zero diagonal in SOR setup")
        dsc = dg / omega
        dinv = skew_pack_np(1.0 / dsc).astype(dtype)
        Lfac = DiagMajorTriangular2D.build(
            c_ax=jnp.asarray(skew_pack_np(cN).astype(dtype)),
            c_un=jnp.asarray(skew_pack_np(cW).astype(dtype)),
            dinv=jnp.asarray(dinv), grid=grid, lower=True,
        )
        Ufac = DiagMajorTriangular2D.build(
            c_ax=jnp.asarray(skew_pack_np(cS).astype(dtype)),
            c_un=jnp.asarray(skew_pack_np(cE).astype(dtype)),
            dinv=jnp.asarray(dinv), grid=grid, lower=False,
        )
        if A_device is None:
            from kryst_tpu.ops.dia import csr_to_dia

            A_device = csr_to_dia(a, dtype=dtype)
        return DiagMajorSOR2D(Lfac=Lfac, Ufac=Ufac, A=A_device, its=its, sweep=sweep)


register_dataclass(
    DiagMajorSOR2D,
    data_fields=["Lfac", "Ufac", "A"],
    meta_fields=["its", "sweep"],
)


# ---------------------------------------------------------------------------
# 3-D (7-point) variant: wavefront planes i+j+k = d, packed (nlev, nx, ny).
# Double application of the batched skew trick — still zero gathers.
# ---------------------------------------------------------------------------


def _batched_skew(X: Array) -> Array:
    """(..., m, L) -> (..., m, m+L-1) with out[..., i, c] = X[..., i, c-i]."""
    *lead, m, L = X.shape
    P = jnp.pad(X, [(0, 0)] * len(lead) + [(0, 0), (0, m)])
    flat = P.reshape(*lead, m * (L + m))[..., : m * (m + L - 1)]
    return flat.reshape(*lead, m, m + L - 1)


def _batched_unskew(Y: Array, L: int) -> Array:
    """Inverse of _batched_skew: (..., m, m+L-1) -> (..., m, L)."""
    *lead, m, _ = Y.shape
    flat = Y.reshape(*lead, m * (m + L - 1))
    flat = jnp.pad(flat, [(0, 0)] * len(lead) + [(0, m)])
    return flat.reshape(*lead, m, L + m)[..., :L]


def skew_pack_3d(X: Array) -> Array:
    """(nx, ny, nz) -> (nx+ny+nz-2, nx, ny), out[d, i, j] = X[i, j, d-i-j]."""
    nx, ny, nz = X.shape
    Y1 = _batched_skew(X)                      # (nx, ny, ny+nz-1): c = j+k
    Y1t = jnp.swapaxes(Y1, 0, 1)               # (ny, nx, L1)
    Y2 = _batched_skew(Y1t)                    # (ny, nx, L2): c = i+j+k
    return jnp.transpose(Y2, (2, 1, 0))        # (L2, nx, ny)


def skew_unpack_3d(Yt: Array, nx: int, ny: int, nz: int) -> Array:
    Y2 = jnp.transpose(Yt, (2, 1, 0))          # (ny, nx, L2)
    Y1t = _batched_unskew(Y2, ny + nz - 1)     # (ny, nx, L1)
    Y1 = jnp.swapaxes(Y1t, 0, 1)               # (nx, ny, L1)
    return _batched_unskew(Y1, nz)             # (nx, ny, nz)


def skew_pack_3d_np(X: np.ndarray) -> np.ndarray:
    nx, ny, nz = X.shape
    out = np.zeros((nx + ny + nz - 2, nx, ny), dtype=X.dtype)
    for i in range(nx):
        for j in range(ny):
            out[i + j : i + j + nz, i, j] = X[i, j]
    return out


@dataclasses.dataclass(frozen=True)
class DiagMajorTriangular3D:
    """Triangular factor of a 7-point 3-D operator, wavefront-plane-major.

    Lower: deps of (i,j,k) are (i-1,j,k)/(i,j-1,k)/(i,j,k-1), all on the
    previous plane at packed positions (i-1,j)/(i,j-1)/(i,j)."""

    # PRE-BLOCKED (nsteps, K, nx, ny) at construction (.build), like the
    # 2-D class: per-apply blocking would copy 4 coefficient arrays
    # inside the solver's while_loop (re-layouts are not hoisted there)
    c_i: Array  # blocked coeff of the +-ny*nz neighbor
    c_j: Array  # coeff of the +-nz neighbor
    c_k: Array  # coeff of the +-1 neighbor
    dinv: Array
    grid: Tuple[int, int, int] = dataclasses.field(metadata=dict(static=True))
    lower: bool = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def build(cls, c_i: Array, c_j: Array, c_k: Array, dinv: Array,
              grid, lower):
        """Construct from FLAT (nlev, nx, ny) packed coefficients."""
        nx, ny, _ = grid
        nlev = c_i.shape[0]
        K = min(_UNROLL, nlev)
        nsteps = -(-nlev // K)
        pad = nsteps * K - nlev

        def blk(a):
            return jnp.pad(a, ((0, pad), (0, 0), (0, 0))).reshape(
                nsteps, K, nx, ny
            )

        return cls(
            c_i=blk(c_i), c_j=blk(c_j), c_k=blk(c_k), dinv=blk(dinv),
            grid=tuple(grid), lower=lower,
        )

    def solve_packed(self, B: Array) -> Array:
        # blocked like the 2-D solve: _UNROLL wavefront planes per scan
        # step, identical arithmetic (see DiagMajorTriangular2D)
        nx, ny, _ = self.grid
        nlev = B.shape[0]
        K = min(_UNROLL, nlev)
        nsteps = -(-nlev // K)
        pad = nsteps * K - nlev
        Bb = jnp.pad(B, ((0, pad), (0, 0), (0, 0))).reshape(nsteps, K, nx, ny)
        cib, cjb, ckb, dib = self.c_i, self.c_j, self.c_k, self.dinv
        order = range(K) if self.lower else range(K - 1, -1, -1)

        if self.lower:

            def substep(x, b, ci, cj, ck, di):
                xi = jnp.pad(x[:-1], ((1, 0), (0, 0)))      # (i-1, j)
                xj = jnp.pad(x[:, :-1], ((0, 0), (1, 0)))   # (i, j-1)
                return (b - ci * xi - cj * xj - ck * x) * di

        else:

            def substep(x, b, ci, cj, ck, di):
                xi = jnp.pad(x[1:], ((0, 1), (0, 0)))       # (i+1, j)
                xj = jnp.pad(x[:, 1:], ((0, 0), (0, 1)))    # (i, j+1)
                return (b - ci * xi - cj * xj - ck * x) * di

        if nsteps <= _UNROLL_MAX_STEPS:
            # static unroll (see the 2-D twin): kills the scan's
            # per-step stacked-output pass; bitwise-identical
            steps = range(nsteps) if self.lower else range(nsteps - 1, -1, -1)
            x = jnp.zeros((nx, ny), dtype=B.dtype)
            out = [None] * nsteps
            for si in steps:
                rows = [None] * K
                for k in order:
                    x = substep(x, Bb[si, k], cib[si, k], cjb[si, k],
                                ckb[si, k], dib[si, k])
                    rows[k] = x
                out[si] = jnp.stack(rows)
            X = jnp.stack(out)
            return X.reshape(nsteps * K, nx, ny)[:nlev]

        def step(x, inp):
            b, ci, cj, ck, di = inp
            rows = [None] * K
            for k in order:
                x = substep(x, b[k], ci[k], cj[k], ck[k], di[k])
                rows[k] = x
            return x, jnp.stack(rows)

        init = jnp.zeros((nx, ny), dtype=B.dtype)
        _, X = lax.scan(
            step, init, (Bb, cib, cjb, ckb, dib), reverse=not self.lower
        )
        return X.reshape(nsteps * K, nx, ny)[:nlev]

    def solve(self, b: Array) -> Array:
        nx, ny, nz = self.grid
        B = skew_pack_3d(b.reshape(nx, ny, nz))
        return skew_unpack_3d(self.solve_packed(B), nx, ny, nz).reshape(-1)


register_dataclass(
    DiagMajorTriangular3D,
    data_fields=["c_i", "c_j", "c_k", "dinv"],
    meta_fields=["grid", "lower"],
)


@dataclasses.dataclass(frozen=True)
class DiagMajorILU3D:
    """Exact ILU(0) apply for 7-point 3-D grid matrices (see 2-D class)."""

    L: DiagMajorTriangular3D
    U: DiagMajorTriangular3D

    def apply(self, r: Array) -> Array:
        nx, ny, nz = self.L.grid
        B = skew_pack_3d(r.reshape(nx, ny, nz))
        X = self.U.solve_packed(self.L.solve_packed(B))
        return skew_unpack_3d(X, nx, ny, nz).reshape(nx * ny * nz)

    @staticmethod
    def setup(a: CSRMatrix, grid, dtype=None) -> "DiagMajorILU3D":
        from kryst_tpu.pc.ilu import _csr_to_rowdicts, _factor_ikj

        nx, ny, nz = grid
        n = nx * ny * nz
        if a.shape[0] != n:
            raise ValueError(f"grid {grid} does not match n={a.shape[0]}")
        dtype = dtype or a.data.dtype
        rows = _factor_ikj(_csr_to_rowdicts(a), n)
        shape = (nx, ny, nz)
        cI = np.zeros(shape); cJ = np.zeros(shape); cK = np.zeros(shape)
        uI = np.zeros(shape); uJ = np.zeros(shape); uK = np.zeros(shape)
        dg = np.zeros(shape)
        snz, snyz = 1, nz
        snxyz = ny * nz
        for kflat, row in enumerate(rows):
            i, rem = divmod(kflat, ny * nz)
            j, k = divmod(rem, nz)
            for c, v in row.items():
                if c == kflat - snxyz:
                    cI[i, j, k] = v
                elif c == kflat - snyz and j > 0:
                    cJ[i, j, k] = v
                elif c == kflat - snz and k > 0:
                    cK[i, j, k] = v
                elif c == kflat + snxyz:
                    uI[i, j, k] = v
                elif c == kflat + snyz and j < ny - 1:
                    uJ[i, j, k] = v
                elif c == kflat + snz and k < nz - 1:
                    uK[i, j, k] = v
                elif c == kflat:
                    dg[i, j, k] = v
                else:
                    raise ValueError(
                        f"entry ({kflat},{c}) outside the 7-point pattern on "
                        f"grid {grid}"
                    )
        ones = skew_pack_3d_np(np.ones(shape)).astype(dtype)
        dinv = skew_pack_3d_np(
            np.where(dg != 0, 1.0 / np.where(dg != 0, dg, 1.0), 0.0)
        ).astype(dtype)
        pk = lambda A_: jnp.asarray(skew_pack_3d_np(A_).astype(dtype))
        L = DiagMajorTriangular3D.build(
            c_i=pk(cI), c_j=pk(cJ), c_k=pk(cK), dinv=jnp.asarray(ones),
            grid=tuple(grid), lower=True,
        )
        U = DiagMajorTriangular3D.build(
            c_i=pk(uI), c_j=pk(uJ), c_k=pk(uK), dinv=jnp.asarray(dinv),
            grid=tuple(grid), lower=False,
        )
        return DiagMajorILU3D(L=L, U=U)


register_dataclass(DiagMajorILU3D, data_fields=["L", "U"], meta_fields=[])


def _extract_7pt(a: CSRMatrix, grid) -> tuple:
    """Split a 7-point matrix on ``grid`` into per-direction coefficient
    bricks (cI/cJ/cK lower, uI/uJ/uK upper, dg diagonal); raises on any
    entry outside the pattern."""
    nx, ny, nz = grid
    shape = (nx, ny, nz)
    cI = np.zeros(shape); cJ = np.zeros(shape); cK = np.zeros(shape)
    uI = np.zeros(shape); uJ = np.zeros(shape); uK = np.zeros(shape)
    dg = np.zeros(shape)
    snz, snyz, snxyz = 1, nz, ny * nz
    for kflat in range(nx * ny * nz):
        i, rem = divmod(kflat, ny * nz)
        j, k = divmod(rem, nz)
        cols, vals = a.row(kflat)
        for c, v in zip(cols.tolist(), vals.tolist()):
            if c == kflat - snxyz:
                cI[i, j, k] = v
            elif c == kflat - snyz and j > 0:
                cJ[i, j, k] = v
            elif c == kflat - snz and k > 0:
                cK[i, j, k] = v
            elif c == kflat + snxyz:
                uI[i, j, k] = v
            elif c == kflat + snyz and j < ny - 1:
                uJ[i, j, k] = v
            elif c == kflat + snz and k < nz - 1:
                uK[i, j, k] = v
            elif c == kflat:
                dg[i, j, k] = v
            else:
                raise ValueError(
                    f"entry ({kflat},{c}) outside the 7-point pattern on "
                    f"grid {grid}"
                )
    return cI, cJ, cK, uI, uJ, uK, dg


@dataclasses.dataclass(frozen=True)
class DiagMajorSOR3D:
    """Exact lexicographic SOR/SSOR sweeps for 7-point 3-D grids —
    the 3-D twin of :class:`DiagMajorSOR2D` (reference sor.rs:124-170
    semantics): ``x += (D/omega + L)^{-1} (b - A x)`` per forward sweep,
    with the triangular solve a wavefront-plane scan (zero gathers)."""

    Lfac: DiagMajorTriangular3D  # (D/omega + L)
    Ufac: DiagMajorTriangular3D  # (D/omega + U)
    A: object  # device operator for the residual matvec
    its: int = dataclasses.field(metadata=dict(static=True))
    sweep: str = dataclasses.field(metadata=dict(static=True))

    def apply(self, r: Array) -> Array:
        nx, ny, nz = self.Lfac.grid
        x = jnp.zeros_like(r)
        for _ in range(self.its):
            if self.sweep in ("forward", "symmetric"):
                res = r - self.A.matvec(x)
                B = skew_pack_3d(res.reshape(nx, ny, nz))
                x = x + skew_unpack_3d(
                    self.Lfac.solve_packed(B), nx, ny, nz
                ).reshape(nx * ny * nz)
            if self.sweep in ("backward", "symmetric"):
                res = r - self.A.matvec(x)
                B = skew_pack_3d(res.reshape(nx, ny, nz))
                x = x + skew_unpack_3d(
                    self.Ufac.solve_packed(B), nx, ny, nz
                ).reshape(nx * ny * nz)
        return x

    @staticmethod
    def setup(
        a: CSRMatrix, grid, omega: float = 1.0, its: int = 1,
        sweep: str = "symmetric", dtype=None, A_device=None,
    ) -> "DiagMajorSOR3D":
        nx, ny, nz = grid
        n = nx * ny * nz
        if a.shape[0] != n:
            raise ValueError(f"grid {grid} does not match matrix n={a.shape[0]}")
        dtype = dtype or a.data.dtype
        cI, cJ, cK, uI, uJ, uK, dg = _extract_7pt(a, grid)
        if (dg == 0).any():
            raise ZeroDivisionError("zero diagonal in SOR setup")
        dinv = skew_pack_3d_np(omega / dg).astype(dtype)
        pk = lambda A_: jnp.asarray(skew_pack_3d_np(A_).astype(dtype))
        Lfac = DiagMajorTriangular3D.build(
            c_i=pk(cI), c_j=pk(cJ), c_k=pk(cK), dinv=jnp.asarray(dinv),
            grid=tuple(grid), lower=True,
        )
        Ufac = DiagMajorTriangular3D.build(
            c_i=pk(uI), c_j=pk(uJ), c_k=pk(uK), dinv=jnp.asarray(dinv),
            grid=tuple(grid), lower=False,
        )
        if A_device is None:
            from kryst_tpu.ops.dia import csr_to_dia

            A_device = csr_to_dia(a, dtype=dtype)
        return DiagMajorSOR3D(Lfac=Lfac, Ufac=Ufac, A=A_device, its=its, sweep=sweep)


register_dataclass(
    DiagMajorSOR3D,
    data_fields=["Lfac", "Ufac", "A"],
    meta_fields=["its", "sweep"],
)
