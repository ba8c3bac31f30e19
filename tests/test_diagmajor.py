"""Exact lexicographic triangular solves, antidiagonal-major (VERDICT r2
item 4): parity vs the level-scheduled exact implementations and the
NumPy oracle — identical arithmetic, gather-free execution."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kryst_tpu.matrix import gallery
from kryst_tpu.pc.diagmajor import (
    DiagMajorILU2D,
    DiagMajorSOR2D,
    skew_pack,
    skew_unpack,
)
from kryst_tpu.pc.ilu import ilu0
from kryst_tpu.pc.sor import SORPC, SweepType


def test_skew_roundtrip_and_content():
    X = jnp.asarray(np.random.default_rng(0).standard_normal((5, 7)))
    Y = skew_pack(X)
    assert Y.shape == (11, 5)
    np.testing.assert_array_equal(np.asarray(skew_unpack(Y, 5, 7)), np.asarray(X))
    for d in range(11):
        for i in range(5):
            if 0 <= d - i < 7:
                assert float(Y[d, i]) == float(X[i, d - i])
            else:
                assert float(Y[d, i]) == 0.0


@pytest.mark.parametrize("nx,ny,builder", [
    (16, 16, lambda: gallery.poisson_2d(16)),
    (12, 20, lambda: gallery.poisson_2d(12, 20)),
    (24, 24, lambda: gallery.convection_diffusion_2d(24, beta=15.0)),
])
def test_ilu_apply_matches_level_scheduled_exact(nx, ny, builder):
    a = builder()
    r = jnp.asarray(np.random.default_rng(1).standard_normal(nx * ny))
    z_ref = np.asarray(ilu0(a).apply(r))
    z_dm = np.asarray(DiagMajorILU2D.setup(a, (nx, ny)).apply(r))
    np.testing.assert_allclose(z_dm, z_ref, atol=1e-13 * np.abs(z_ref).max())


def test_sor_apply_matches_level_scheduled_exact():
    a = gallery.convection_diffusion_2d(24, beta=15.0)
    r = jnp.asarray(np.random.default_rng(2).standard_normal(576))
    ref = SORPC.setup(a, omega=1.3, its=2, sweep=SweepType.SYMMETRIC)
    dm = DiagMajorSOR2D.setup(a, (24, 24), omega=1.3, its=2, sweep="symmetric")
    z_ref = np.asarray(ref.smooth(r))
    z_dm = np.asarray(dm.apply(r))
    np.testing.assert_allclose(z_dm, z_ref, atol=1e-13 * np.abs(z_ref).max())


def test_gmres_iteration_counts_identical_to_exact_ilu():
    # byte-identical iteration counts: the diagmajor apply is the SAME
    # arithmetic as the exact level-scheduled ILU (and hence the NumPy
    # oracle's sequential substitution, np_ref.py)
    from kryst_tpu.solvers.gmres import gmres

    a = gallery.convection_diffusion_2d(32, beta=20.0)
    A = a.to_ell()
    b = jnp.ones(1024)
    _, s_ref = gmres(A, b, M=ilu0(a), side="right", tol=1e-10, maxiter=400)
    _, s_dm = gmres(
        A, b, M=DiagMajorILU2D.setup(a, (32, 32)), side="right",
        tol=1e-10, maxiter=400,
    )
    assert int(s_ref.iterations) == int(s_dm.iterations)
    assert bool(s_dm.reached_tol)


def test_api_dispatch_grid_fast_path():
    from kryst_tpu.api import PCConfig, solve

    a = gallery.poisson_2d(32)
    b = jnp.ones(1024)
    x1, s1 = solve(a, b, solver="gmres_right", pc=PCConfig.ilu0(grid=(32, 32)),
                   tol=1e-9, maxiter=300)
    x2, s2 = solve(a, b, solver="gmres_right", pc=PCConfig.ilu0(),
                   tol=1e-9, maxiter=300)
    assert int(s1.iterations) == int(s2.iterations)
    x3, s3 = solve(a, b, solver="pcg", pc=PCConfig.ssor(omega=1.2, grid=(32, 32)),
                   tol=1e-9, maxiter=300)
    assert bool(s3.reached_tol)


def test_diagmajor_rejects_non_5point():
    a = gallery.poisson_3d(8)
    with pytest.raises(ValueError, match="5-point"):
        DiagMajorILU2D.setup(a, (8, 64))


def test_ilu3d_matches_level_scheduled_exact():
    from kryst_tpu.pc.diagmajor import DiagMajorILU3D

    a = gallery.poisson_3d(6, 9, 7)
    r = jnp.asarray(np.random.default_rng(3).standard_normal(6 * 9 * 7))
    z_ref = np.asarray(ilu0(a).apply(r))
    z_dm = np.asarray(DiagMajorILU3D.setup(a, (6, 9, 7)).apply(r))
    np.testing.assert_allclose(z_dm, z_ref, atol=1e-13 * np.abs(z_ref).max())


def test_sor3d_matches_level_scheduled_exact():
    from kryst_tpu.pc.diagmajor import DiagMajorSOR3D

    a = gallery.poisson_3d(6, 9, 7)
    r = jnp.asarray(np.random.default_rng(4).standard_normal(6 * 9 * 7))
    ref = SORPC.setup(a, omega=1.3, its=2, sweep=SweepType.SYMMETRIC)
    dm = DiagMajorSOR3D.setup(a, (6, 9, 7), omega=1.3, its=2, sweep="symmetric")
    z_ref = np.asarray(ref.smooth(r))
    z_dm = np.asarray(dm.apply(r))
    np.testing.assert_allclose(z_dm, z_ref, atol=1e-13 * np.abs(z_ref).max())


def test_api_dispatch_3d_ssor_grid():
    from kryst_tpu.api import PCConfig, solve

    a = gallery.poisson_3d(8)
    b = jnp.ones(512)
    x, s = solve(a, b, solver="pcg", pc=PCConfig.ssor(omega=1.2, grid=(8, 8, 8)),
                 tol=1e-9, maxiter=300)
    assert bool(s.reached_tol)
    x2, s2 = solve(a, b, solver="pcg", pc=PCConfig.ssor(omega=1.2), tol=1e-9,
                   maxiter=300)
    assert int(s.iterations) == int(s2.iterations)


def test_api_dispatch_3d_grid():
    from kryst_tpu.api import PCConfig, solve

    a = gallery.poisson_3d(8)
    b = jnp.ones(512)
    x, s = solve(a, b, solver="pcg", pc=PCConfig.ilu0(grid=(8, 8, 8)),
                 tol=1e-9, maxiter=200)
    assert bool(s.reached_tol)
    x2, s2 = solve(a, b, solver="pcg", pc=PCConfig.ilu0(), tol=1e-9,
                   maxiter=200)
    assert int(s.iterations) == int(s2.iterations)


def test_solve_packed_static_unroll_matches_scan_bitwise(monkeypatch):
    # round-5: solve_packed statically unrolls level blocks (scan's
    # stacked-ys output paid a full buffer pass per step — 284.5 vs
    # 156.6 us/apply at 256^2 on-chip). The two forms must be BITWISE
    # equal; force the scan fallback by zeroing the unroll cap.
    import kryst_tpu.pc.diagmajor as dm

    a = gallery.poisson_2d(16, 20)
    pc = DiagMajorILU2D.setup(a, grid=(16, 20))
    r = jnp.asarray(np.random.default_rng(9).standard_normal(320))
    y_unrolled = pc.apply(r)
    assert dm._UNROLL_MAX_STEPS > 0  # default path really was unrolled
    monkeypatch.setattr(dm, "_UNROLL_MAX_STEPS", 0)
    y_scan = pc.apply(r)
    # same arithmetic and order; on CPU the two forms FUSE differently
    # (FMA contraction in the unrolled body) so allow ULP-level noise —
    # the on-chip f32 comparison (tools/tpu_r5_stage7.py) is bitwise
    np.testing.assert_allclose(
        np.asarray(y_unrolled), np.asarray(y_scan), rtol=1e-12, atol=1e-15
    )
