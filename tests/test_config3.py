"""BASELINE config 3: BiCGStab / MINRES + Chebyshev / SOR on SuiteSparse-like
matrices (bcsstk, thermal, atmosmodd proxies — no network access, see
gallery docstrings)."""
import jax.numpy as jnp
import numpy as np

from kryst_tpu import pcg
from kryst_tpu.matrix import gallery
from kryst_tpu.pc.chebyshev import ChebyshevPC
from kryst_tpu.pc.sor import SweepType, SORPC, ssor
from kryst_tpu.solvers.bicgstab import bicgstab
from kryst_tpu.solvers.gmres import gmres
from kryst_tpu.solvers.minres import minres


def test_bcsstk_minres_chebyshev():
    a = gallery.bcsstk_like(48)  # 98 dof, SPD, kappa ~ 1e5
    A = a.to_dense_operator()
    b = jnp.ones(a.shape[0])
    eigs = np.linalg.eigvalsh(a.todense())
    pc = ChebyshevPC.setup(A, degree=12, emin=float(eigs[0]), emax=float(eigs[-1]))
    x, s = pcg(A, b, M=pc, tol=1e-8, maxiter=2000)
    _, s_plain = minres(A, b, tol=1e-8, maxiter=2000)
    assert bool(s.reached_tol)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a.todense(), np.ones(a.shape[0])),
        rtol=1e-4,
    )
    assert int(s.iterations) < int(s_plain.iterations)


def test_bcsstk_minres_converges():
    a = gallery.bcsstk_like(32)
    A = a.to_ell()
    b = jnp.ones(a.shape[0])
    x, s = minres(A, b, tol=1e-9, maxiter=2000)
    assert bool(s.reached_tol)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a.todense(), np.ones(a.shape[0])),
        rtol=1e-4,
    )


def test_thermal_pcg_ssor():
    a = gallery.thermal_like(24)
    A = a.to_ell()
    b = jnp.ones(576)
    pc = ssor(a, omega=1.3)
    x, s = pcg(A, b, M=pc, tol=1e-9, maxiter=1000)
    assert bool(s.reached_tol)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a.todense(), np.ones(576)), atol=1e-5
    )


def test_atmosmodd_bicgstab_sor():
    a = gallery.atmosmodd_like(10)
    dense = a.todense()
    assert not np.allclose(dense, dense.T)  # genuinely nonsymmetric
    A = a.to_ell()
    b = jnp.ones(1000)
    x, s = bicgstab(A, b, M=SORPC.setup(a, omega=1.0, sweep=SweepType.FORWARD),
                    tol=1e-9, maxiter=500)
    assert bool(s.reached_tol)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, np.ones(1000)), atol=1e-5)


def test_atmosmodd_gmres_ssor():
    a = gallery.atmosmodd_like(8)
    A = a.to_ell()
    b = jnp.ones(512)
    x, s = gmres(A, b, M=ssor(a, omega=1.0), side="right", tol=1e-9,
                 maxiter=300, restart=30)
    assert bool(s.reached_tol)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a.todense(), np.ones(512)), atol=1e-5
    )


def test_bcsstk_chebyshev_auto_bounds_match_hand_tuned():
    # VERDICT r2 item 9: ChebyshevPC with NO manual bounds (Lanczos
    # spectrum pre-pass) must match hand-tuned iteration counts.
    a = gallery.bcsstk_like(48)
    A = a.to_dense_operator()
    b = jnp.ones(a.shape[0])
    eigs = np.linalg.eigvalsh(a.todense())
    pc_hand = ChebyshevPC.setup(
        A, degree=12, emin=float(eigs[0]), emax=float(eigs[-1])
    )
    pc_auto = ChebyshevPC.setup(A, degree=12)  # no bounds, no emin_scale
    _, s_hand = pcg(A, b, M=pc_hand, tol=1e-8, maxiter=2000)
    x, s_auto = pcg(A, b, M=pc_auto, tol=1e-8, maxiter=2000)
    assert bool(s_auto.reached_tol)
    assert int(s_auto.iterations) <= int(s_hand.iterations) + 10
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a.todense(), np.ones(a.shape[0])),
        rtol=1e-4,
    )


def test_lanczos_spectrum_bounds_poisson():
    from kryst_tpu.pc.chebyshev import lanczos_spectrum

    p = gallery.poisson_2d(32)
    lo, hi = lanczos_spectrum(p.to_ell(), iters=40)
    eigs = np.linalg.eigvalsh(p.todense())
    assert abs(hi - eigs[-1]) < 1e-3 * eigs[-1]
    assert 0 < lo < 2 * eigs[0] + 0.05  # theta_min >= lambda_min, close


def test_expander_defeats_rcm_and_amg_ell_fallback_converges():
    # VERDICT r2 item 8: a pathological-bandwidth matrix RCM cannot
    # rescue. AMG must fall back to ELL gather levels (correct, slow on
    # TPU — cost recorded in docs/STATUS.md) and still converge.
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    from kryst_tpu.pc.amg import AMGLevel, AMGPC

    a = gallery.expander_laplacian(2048, degree=6, shift=0.5)
    A = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)
    p = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
    Ap = (A[p][:, p]).tocoo()
    assert len(np.unique(Ap.col - Ap.row)) > 1000  # RCM is defeated

    pc = AMGPC.setup(a, coarse_size=128, max_levels=6)
    assert any(isinstance(lv, AMGLevel) for lv in pc.levels)  # ELL fallback
    b = jnp.ones(2048)
    x, s = pcg(a.to_ell(), b, M=pc, tol=1e-8, maxiter=400)
    assert bool(s.reached_tol)
    r = np.asarray(b) - A @ np.asarray(x)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) <= 1e-7
