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
