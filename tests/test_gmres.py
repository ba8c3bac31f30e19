"""GMRES / FGMRES tests (reference gmres.rs:412-528, fgmres.rs:531-551,
tests/solver_iterative.rs:57-77)."""
import jax.numpy as jnp
import numpy as np

from kryst_tpu import JacobiPC
from kryst_tpu.matrix import gallery
from kryst_tpu.solvers.gmres import fgmres, gmres


def _solve_dense(A, b):
    return np.linalg.solve(np.asarray(A), np.asarray(b))


def test_gmres_small_nonsymmetric():
    A = jnp.array([[2.0, 1.0], [0.0, 3.0]])
    b = jnp.array([3.0, 6.0])
    x, stats = gmres(A, b, tol=1e-12, maxiter=10, restart=5)
    np.testing.assert_allclose(np.asarray(x), _solve_dense(A, b), rtol=1e-9)
    assert bool(stats.reached_tol)


def test_gmres_vs_direct_random_nonsymmetric():
    # iterative vs direct cross-validation (solver_iterative.rs:57-77)
    A = gallery.random_nonsymmetric(40)
    b = np.random.default_rng(5).standard_normal(40)
    x, stats = gmres(jnp.asarray(A), jnp.asarray(b), tol=1e-12, maxiter=200, restart=40)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), atol=1e-6)
    assert bool(stats.reached_tol)


def test_gmres_restart_cycles():
    # force several restart cycles (restart < n)
    csr = gallery.convection_diffusion_2d(10)
    A = csr.to_dense_operator()
    b = jnp.ones(100)
    x, stats = gmres(A, b, tol=1e-10, maxiter=500, restart=10)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(csr.todense(), np.ones(100)), atol=1e-6
    )
    assert int(stats.iterations) > 10  # actually restarted


def test_gmres_left_vs_right_preconditioning():
    # L/R preconditioned GMRES both reach the same solution
    # (gmres.rs:438-528)
    csr = gallery.convection_diffusion_2d(8)
    A = csr.to_dense_operator()
    b = jnp.ones(64)
    M = JacobiPC.setup(A)
    expected = np.linalg.solve(csr.todense(), np.ones(64))
    for side in ("left", "right"):
        x, stats = gmres(A, b, M=M, side=side, tol=1e-10, maxiter=300, restart=20)
        np.testing.assert_allclose(np.asarray(x), expected, atol=1e-6, err_msg=side)
        assert bool(stats.reached_tol), side


def test_gmres_mgs2_matches_cgs2():
    A = gallery.random_nonsymmetric(30)
    b = np.random.default_rng(6).standard_normal(30)
    x1, s1 = gmres(jnp.asarray(A), jnp.asarray(b), tol=1e-10, maxiter=100, restart=30, orthog="cgs2")
    x2, s2 = gmres(jnp.asarray(A), jnp.asarray(b), tol=1e-10, maxiter=100, restart=30, orthog="mgs2")
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-7)
    assert abs(int(s1.iterations) - int(s2.iterations)) <= 2


def test_gmres_happy_breakdown_identity():
    # A = I converges in one step via happy breakdown
    A = jnp.eye(10)
    b = jnp.arange(1.0, 11.0)
    x, stats = gmres(A, b, tol=1e-12, maxiter=50, restart=10)
    np.testing.assert_allclose(np.asarray(x), np.asarray(b), rtol=1e-10)
    assert int(stats.iterations) <= 2


def test_gmres_diagonal_exact_steps():
    # k distinct eigenvalues -> k iterations
    A = jnp.diag(jnp.array([1.0, 2.0, 3.0, 1.0, 2.0]))
    b = jnp.ones(5)
    x, stats = gmres(A, b, tol=1e-12, maxiter=20, restart=10)
    np.testing.assert_allclose(np.asarray(x), [1, 0.5, 1 / 3, 1, 0.5], rtol=1e-9)
    assert int(stats.iterations) <= 4


def test_fgmres_fixed_pc_matches_gmres_right():
    # with a fixed PC, FGMRES == right-preconditioned GMRES (Saad §9.4)
    csr = gallery.convection_diffusion_2d(8)
    A = csr.to_dense_operator()
    b = jnp.ones(64)
    M = JacobiPC.setup(A)
    x1, s1 = fgmres(A, b, M=M, tol=1e-10, maxiter=200, restart=20)
    x2, s2 = gmres(A, b, M=M, side="right", tol=1e-10, maxiter=200, restart=20)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-7)
    assert abs(int(s1.iterations) - int(s2.iterations)) <= 2


def test_fgmres_flexible_pc():
    # iteration-varying preconditioner (the FlexiblePreconditioner path,
    # fgmres.rs:531-551): alternate between identity and Jacobi
    csr = gallery.poisson_2d(8)
    A = csr.to_dense_operator()
    b = jnp.ones(64)
    inv_diag = 1.0 / jnp.asarray(csr.diag())

    def flex_M(it, v):
        return jnp.where(it % 2 == 0, inv_diag * v, v)

    x, stats = fgmres(A, b, M=flex_M, tol=1e-10, maxiter=300, restart=20)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(csr.todense(), np.ones(64)), atol=1e-6
    )
    assert bool(stats.reached_tol)


def test_gmres_history_monotone():
    A = gallery.random_nonsymmetric(25)
    b = np.ones(25)
    x, stats = gmres(
        jnp.asarray(A), jnp.asarray(b), tol=1e-10, maxiter=100, restart=25,
        record_history=True,
    )
    hist = np.asarray(stats.residual_history)
    its = int(stats.iterations)
    valid = hist[: its + 1]
    assert np.isfinite(valid).all()
    # GMRES residual estimates are monotonically nonincreasing within a cycle
    assert valid[-1] <= valid[0]


def test_gmres_singular_warns_zero_pivot_or_stalls():
    # singular system: should not crash; either stalls or flags breakdown
    A = jnp.array([[1.0, 0.0], [0.0, 0.0]])
    b = jnp.array([1.0, 1.0])
    x, stats = gmres(A, b, tol=1e-12, maxiter=10, restart=5)
    assert np.isfinite(np.asarray(x)).all()


def test_orthog_variants_converge_alike():
    # classical (single-pass, fgmres.rs:217-224's Orthog::Classical) and
    # adaptive (conditional second pass, fgmres.rs:217-247) match CGS2
    from kryst_tpu.solvers.gmres import fgmres, gmres

    a = gallery.convection_diffusion_2d(20)
    A = a.to_ell()
    b = jnp.ones(400)
    expected = np.linalg.solve(a.todense(), np.ones(400))
    xr, sr = gmres(A, b, tol=1e-9, maxiter=800, restart=20, orthog="cgs2")
    for orthog in ("classical", "adaptive", "mgs2"):
        x, st = gmres(A, b, tol=1e-9, maxiter=800, restart=20, orthog=orthog)
        assert bool(st.reached_tol), orthog
        np.testing.assert_allclose(np.asarray(x), expected, atol=1e-6, err_msg=orthog)
        assert abs(int(st.iterations) - int(sr.iterations)) <= 4, orthog
    for orthog in ("classical", "adaptive"):
        x, st = fgmres(A, b, tol=1e-9, maxiter=800, restart=20, orthog=orthog)
        assert bool(st.reached_tol), orthog
        np.testing.assert_allclose(np.asarray(x), expected, atol=1e-6, err_msg=orthog)


def test_orthog_unknown_raises():
    import pytest

    from kryst_tpu.solvers.gmres import gmres

    a = gallery.poisson_2d(4)
    with pytest.raises(ValueError, match="orthog"):
        gmres(a.to_ell(), jnp.ones(16), orthog="nope")


def test_panel_dispatch_forms_are_equivalent(monkeypatch):
    """Full-width (VMEM-resident) and chunked active-prefix panels must
    produce identical orthogonalization — the residency dispatch is a
    perf decision only."""
    import numpy as np

    from kryst_tpu.solvers import gmres as gm

    rng = np.random.default_rng(7)
    mp1, n = 9, 40
    V = jnp.asarray(rng.standard_normal((mp1, n)))
    w = jnp.asarray(rng.standard_normal(n))
    for j in (0, 3, 7, 8):
        monkeypatch.setattr(gm, "_PANEL_RESIDENT_BYTES", 1 << 40)
        h_full = gm._panel_dots(V, w, jnp.int32(j), None)
        c_full = gm._panel_correction(V, h_full, jnp.int32(j))
        w_full, hh_full = gm._orthogonalize_cgs2(V, w, jnp.int32(j))
        monkeypatch.setattr(gm, "_PANEL_RESIDENT_BYTES", 0)
        h_chunk = gm._panel_dots(V, w, jnp.int32(j), None)
        c_chunk = gm._panel_correction(V, h_chunk, jnp.int32(j))
        w_chunk, hh_chunk = gm._orthogonalize_cgs2(V, w, jnp.int32(j))
        np.testing.assert_allclose(h_full, h_chunk, rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(c_full, c_chunk, rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(w_full, w_chunk, rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(hh_full, hh_chunk, rtol=1e-12, atol=1e-14)
