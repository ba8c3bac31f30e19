"""Test/benchmark matrix gallery.

Builds the systems used across the reference's tests and the BASELINE
configs: 2-D/3-D Poisson finite-difference stencils, nonsymmetric
convection-diffusion, SPD tridiagonal fixtures, ill-conditioned diagonals
and random SPD matrices (reference tests/preconditioner_integration.rs:16-77,
tests/solver_iterative.rs:18-77).

Each builder returns a host :class:`CSRMatrix`; companion helpers return the
matching stencil operator for the structured-grid fast path.
"""
from __future__ import annotations

import numpy as np

from kryst_tpu.matrix.csr import CSRMatrix


def poisson_2d(nx: int, ny: int | None = None, dtype=np.float64) -> CSRMatrix:
    """5-point 2-D Poisson (Dirichlet): 4 on diagonal, -1 neighbors."""
    ny = ny or nx
    n = nx * ny

    def idx(i, j):
        return i * ny + j

    rows, cols, vals = [], [], []
    for i in range(nx):
        for j in range(ny):
            k = idx(i, j)
            rows.append(k); cols.append(k); vals.append(4.0)
            for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < nx and 0 <= jj < ny:
                    rows.append(k); cols.append(idx(ii, jj)); vals.append(-1.0)
    return CSRMatrix.from_coo(rows, cols, np.array(vals, dtype=dtype), (n, n))


def poisson_2d_stencil(nx: int, ny: int | None = None, dtype=None):
    import jax.numpy as jnp

    from kryst_tpu.core.linop import StencilOperator2D

    ny = ny or nx
    dtype = dtype or jnp.float32
    one = jnp.asarray(-1.0, dtype)
    return StencilOperator2D(
        c=jnp.asarray(4.0, dtype), n=one, s=one, w=one, e=one, grid=(nx, ny)
    )


def poisson_3d(nx: int, ny: int | None = None, nz: int | None = None, dtype=np.float64) -> CSRMatrix:
    """7-point 3-D Poisson (Dirichlet): 6 on diagonal, -1 neighbors."""
    ny = ny or nx
    nz = nz or nx
    n = nx * ny * nz

    # vectorized assembly: diagonal + 6 shifted bands
    ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
    lin = (ii * ny + jj) * nz + kk
    rows = [lin.ravel()]
    cols = [lin.ravel()]
    vals = [np.full(n, 6.0, dtype=dtype)]
    for axis, extent in ((0, nx), (1, ny), (2, nz)):
        for sgn in (-1, 1):
            coord = (ii, jj, kk)[axis]
            mask = (coord + sgn >= 0) & (coord + sgn < extent)
            stride = (ny * nz, nz, 1)[axis]
            r = lin[mask]
            rows.append(r)
            cols.append(r + sgn * stride)
            vals.append(np.full(r.size, -1.0, dtype=dtype))
    return CSRMatrix.from_coo(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals), (n, n)
    )


def poisson_3d_stencil(nx: int, ny: int | None = None, nz: int | None = None, dtype=None):
    import jax.numpy as jnp

    from kryst_tpu.core.linop import StencilOperator3D

    ny = ny or nx
    nz = nz or nx
    dtype = dtype or jnp.float32
    m1 = jnp.asarray(-1.0, dtype)
    return StencilOperator3D(
        c=jnp.asarray(6.0, dtype), lo=(m1, m1, m1), hi=(m1, m1, m1), grid=(nx, ny, nz)
    )


def convection_diffusion_2d(nx: int, ny: int | None = None, beta: float = 10.0, dtype=np.float64) -> CSRMatrix:
    """Nonsymmetric convection-diffusion: -Δu + beta·u_x, upwind differences.

    The GMRES+ILU(0) benchmark operator (BASELINE config 2).
    """
    ny = ny or nx
    n = nx * ny
    h = 1.0 / (nx + 1)
    b = beta * h  # cell Peclet contribution

    def idx(i, j):
        return i * ny + j

    rows, cols, vals = [], [], []
    for i in range(nx):
        for j in range(ny):
            k = idx(i, j)
            rows.append(k); cols.append(k); vals.append(4.0 + b)
            for (di, dj, v) in ((-1, 0, -1.0 - b), (1, 0, -1.0), (0, -1, -1.0), (0, 1, -1.0)):
                ii, jj = i + di, j + dj
                if 0 <= ii < nx and 0 <= jj < ny:
                    rows.append(k); cols.append(idx(ii, jj)); vals.append(v)
    return CSRMatrix.from_coo(rows, cols, np.array(vals, dtype=dtype), (n, n))


def tridiag(n: int, lower=-1.0, diag=2.0, upper=-1.0, dtype=np.float64) -> CSRMatrix:
    """SPD/nonsymmetric tridiagonal fixture (preconditioner_integration.rs:16-33)."""
    rows = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    cols = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    vals = np.concatenate(
        [np.full(n, diag), np.full(n - 1, lower), np.full(n - 1, upper)]
    ).astype(dtype)
    return CSRMatrix.from_coo(rows, cols, vals, (n, n))


def ill_conditioned_diag(n: int, cond: float = 1e6, dtype=np.float64) -> np.ndarray:
    """Diagonal matrix with condition number ``cond`` (preconditioner_integration.rs ill-conditioned fixture)."""
    d = np.logspace(0, np.log10(cond), n).astype(dtype)
    return np.diag(d)


def random_spd(n: int, rng=None, shift: float = 1.0, dtype=np.float64) -> np.ndarray:
    """A = MᵀM + shift·I — the iterative-vs-direct fixture (solver_iterative.rs:18-30)."""
    rng = rng or np.random.default_rng(0)
    m = rng.standard_normal((n, n)).astype(dtype)
    return m.T @ m + shift * np.eye(n, dtype=dtype)


def random_nonsymmetric(n: int, rng=None, shift: float = 5.0, dtype=np.float64) -> np.ndarray:
    """Diagonally-shifted random nonsymmetric matrix (solver_iterative.rs:57-63)."""
    rng = rng or np.random.default_rng(1)
    return rng.standard_normal((n, n)).astype(dtype) + shift * np.eye(n, dtype=dtype)
