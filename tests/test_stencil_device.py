"""Device-built constant-stencil DIA operators (ops/dia.stencil_to_dia).

The constructor must be BITWISE-equal to the host path
(csr_to_dia(gallery.poisson_3d(...), grid=...)) in panel data, offsets,
streaming layout, and matvec results — it is a transport optimization
(no host assembly / upload), not a different operator.

Reference parity: the reference assembles structured operators host-side
(src/matrix/sparse.rs:22-47, tests/preconditioner_integration.rs:16-33);
stencil_to_dia is the TPU-native replacement for those fixtures.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import (
    DIAOperator, _stencil_panels_device, csr_to_dia, stencil_to_dia,
)


def test_poisson3d_bitwise_equal_to_host_path():
    grid = (12, 10, 9)
    a = gallery.poisson_3d(*grid)
    host = csr_to_dia(a, dtype=np.float32, grid=grid)
    dev = stencil_to_dia(6.0, -1.0, -1.0, grid, dtype=np.float32)
    assert dev.offsets == host.offsets
    assert dev.n == host.n
    np.testing.assert_array_equal(np.asarray(dev.data), np.asarray(host.data))
    assert dev.symmetric
    # the device path KNOWS the canonical deltas (the host detector can
    # decline on tiny grids where the offset decomposition is ambiguous)
    assert dev.cs_grid == grid
    assert dev.cs_deltas[dev.offsets.index(0)] == (0, 0, 0)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(dev.n).astype(np.float32)
    )
    # host takes the DIA-XLA path here (no cs detection on this tiny
    # grid), dev the const-stencil path: same polynomial, different
    # summation order
    np.testing.assert_allclose(
        np.asarray(jax.jit(host.matvec)(x)),
        np.asarray(jax.jit(dev.matvec)(x)), rtol=2e-5, atol=2e-5,
    )


def test_poisson3d_matvec_bitwise_same_kernel():
    """On a grid where the host detector finds the stencil too, both
    operators dispatch to the same const-stencil kernel — results must be
    BITWISE equal."""
    grid = (20, 18, 17)  # axes > 2*reach: unambiguous decomposition
    a = gallery.poisson_3d(*grid)
    host = csr_to_dia(a, dtype=np.float32, grid=grid)
    dev = stencil_to_dia(6.0, -1.0, -1.0, grid, dtype=np.float32)
    assert host.cs_deltas is not None
    assert dev.cs_deltas == host.cs_deltas
    np.testing.assert_array_equal(
        np.asarray(dev.cs_coeffs), np.asarray(host.cs_coeffs)
    )
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal(dev.n).astype(np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(jax.jit(host.matvec)(x)), np.asarray(jax.jit(dev.matvec)(x))
    )


def test_poisson2d_and_flat_twin():
    grid = (17, 13)
    a = gallery.poisson_2d(*grid)
    host = csr_to_dia(a, dtype=np.float32, grid=grid)
    dev = stencil_to_dia(4.0, -1.0, -1.0, grid, dtype=np.float32)
    assert dev.offsets == host.offsets
    np.testing.assert_array_equal(np.asarray(dev.data), np.asarray(host.data))
    # resident f32 sizes must carry the flat twin (the XLA shifted-slice
    # path slices it; a 2-D panel argument is sublane-tiled — CLAUDE.md
    # round-5 finding)
    assert dev.data_flat is not None
    np.testing.assert_array_equal(
        np.asarray(dev.data_flat), np.asarray(dev.data).reshape(-1)
    )


def test_nonsymmetric_transpose_twin():
    # upwind-ish: different sub/super-diagonal coefficients
    grid = (9, 11)
    dev = stencil_to_dia(5.0, (-2.0, -1.5), (-0.5, -1.0), grid,
                         dtype=np.float32)
    assert not dev.symmetric
    dense = np.asarray(dev.todense())
    # build the reference dense operator directly from the definition
    n0, n1 = grid
    ref = np.zeros((n0 * n1, n0 * n1), np.float32)
    for i0 in range(n0):
        for i1 in range(n1):
            i = i0 * n1 + i1
            ref[i, i] = 5.0
            if i0 > 0:
                ref[i, i - n1] = -2.0
            if i0 < n0 - 1:
                ref[i, i + n1] = -0.5
            if i1 > 0:
                ref[i, i - 1] = -1.5
            if i1 < n1 - 1:
                ref[i, i + 1] = -1.0
    np.testing.assert_array_equal(dense, ref)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(dev.n).astype(np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(dev.rmatvec(x)), ref.T @ np.asarray(x), rtol=1e-5,
        atol=1e-5,
    )


def test_zero_coefficient_diagonals_pruned():
    grid = (8, 9)
    dev = stencil_to_dia(2.0, (0.0, -1.0), (0.0, -1.0), grid,
                         dtype=np.float32)
    assert dev.offsets == (-1, 0, 1)


def test_blocked_layout_matches_plan_dia():
    """The device-side re-layout must equal plan_dia's host layout for the
    same geometry (the streaming kernel reads it blindly)."""
    from kryst_tpu.ops.streamed import DIAPlan, _plan_geometry, plan_dia

    grid = (23, 17)
    host = csr_to_dia(gallery.poisson_2d(*grid), dtype=np.float32, grid=grid)
    for blk_dt in (np.dtype(np.float32), np.dtype(jnp.bfloat16)):
        bm0 = 16  # force multiple blocks on this tiny grid
        plan = _plan_geometry(host.n, host.offsets, bm0)
        if blk_dt.itemsize < 4 and plan.block_rows % 16:
            bm16 = -(-plan.block_rows // 16) * 16
            plan = DIAPlan(bm16, plan.margin, -(-plan.mpad // bm16) * bm16)
        dblk_host, plan_host = plan_dia(
            np.asarray(host.data), host.offsets, block_rows=bm0,
            blk_dtype=blk_dt,
        )
        assert plan_host == plan
        _, dblk_dev, _ = _stencil_panels_device(
            jnp.asarray(np.asarray(host.cs_coeffs)), host.cs_deltas, grid,
            np.dtype(np.float32), plan.block_rows, plan.mpad, blk_dt, False,
        )
        np.testing.assert_array_equal(np.asarray(dblk_dev), dblk_host)


def test_f64_const_path():
    grid = (10, 11, 8)
    dev = stencil_to_dia(6.0, -1.0, -1.0, grid, dtype=np.float64)
    assert dev.data_flat is None  # const_spmv_xla needs no panel reads
    a = gallery.poisson_3d(*grid)
    import scipy.sparse as sp

    A = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)
    x = np.random.default_rng(2).standard_normal(dev.n)
    np.testing.assert_allclose(
        np.asarray(dev.matvec(jnp.asarray(x))), A @ x, rtol=1e-13, atol=1e-13
    )


def test_gmg_setup_from_device_operator_matches_csr_path():
    grid = (24, 20)
    from kryst_tpu.pc.gmg import GMGPC

    a = gallery.poisson_2d(*grid)
    pc_host = GMGPC.setup(a, grid, rap="probe", symmetric=True,
                          dtype=np.float32)
    dev = stencil_to_dia(4.0, -1.0, -1.0, grid, dtype=np.float32)
    pc_dev = GMGPC.setup(dev, grid, rap="probe")
    assert len(pc_dev.levels) == len(pc_host.levels)
    for lh, ld in zip(pc_host.levels, pc_dev.levels):
        assert ld.A.offsets == lh.A.offsets
        np.testing.assert_allclose(
            np.asarray(ld.A.data), np.asarray(lh.A.data), rtol=1e-6,
            atol=1e-6,
        )
    r = jnp.asarray(
        np.random.default_rng(3).standard_normal(dev.n).astype(np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(pc_dev.apply(r)), np.asarray(pc_host.apply(r)),
        rtol=1e-5, atol=1e-6,
    )


def test_gmg_setup_device_operator_solver_parity():
    grid = (20, 20, 12)
    from kryst_tpu.pc.gmg import GMGPC
    from kryst_tpu.solvers.cg import pcg

    a = gallery.poisson_3d(*grid)
    A_host = csr_to_dia(a, dtype=np.float32, grid=grid)
    pc_host = GMGPC.setup(a, grid, rap="probe", symmetric=True,
                          dtype=np.float32)
    dev = stencil_to_dia(6.0, -1.0, -1.0, grid, dtype=np.float32)
    pc_dev = GMGPC.setup(dev, grid, rap="probe")
    b = jnp.ones(dev.n, jnp.float32)
    _, st_h = pcg(A_host, b, M=pc_host, tol=1e-4, maxiter=100)
    _, st_d = pcg(dev, b, M=pc_dev, tol=1e-4, maxiter=100)
    assert abs(int(st_h.iterations) - int(st_d.iterations)) <= 1
    assert bool(st_d.converged)
    # and the two paths are not merely close — identical hierarchies give
    # identical residuals
    np.testing.assert_allclose(
        float(st_d.rel_residual), float(st_h.rel_residual), rtol=1e-5
    )


def test_gmg_setup_device_requires_probe():
    dev = stencil_to_dia(4.0, -1.0, -1.0, (12, 12), dtype=np.float32)
    from kryst_tpu.pc.gmg import GMGPC

    with pytest.raises(ValueError, match="probe"):
        GMGPC.setup(dev, (12, 12), rap="host")


def test_gmg_setup_device_tiny_grid_direct_inverse():
    grid = (6, 6)
    from kryst_tpu.pc.gmg import GMGPC

    dev = stencil_to_dia(4.0, -1.0, -1.0, grid, dtype=np.float32)
    pc = GMGPC.setup(dev, grid, rap="probe", coarse_size=512)
    assert len(pc.levels) == 0
    r = jnp.asarray(
        np.random.default_rng(4).standard_normal(dev.n).astype(np.float32)
    )
    a = gallery.poisson_2d(*grid)
    import scipy.sparse as sp

    A = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape).toarray()
    np.testing.assert_allclose(
        np.asarray(pc.apply(r)), np.linalg.solve(A, np.asarray(r)),
        rtol=1e-4, atol=1e-5,
    )
