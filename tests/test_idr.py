"""IDR(s) tests (solvers/idr.py — beyond-reference addition; van Gijzen &
Sonneveld TOMS 2011). Coverage mirrors the bicgstab/cgs suites
(reference bicgstab.rs:315-328) plus IDR-specific properties: s-sweep,
preconditioned runs, breakdown flags, jit/pytree safety, and the
sharded (8-device mesh) run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kryst_tpu.matrix import gallery
from kryst_tpu.solvers.idr import idr


def _nonsym(n=20, seed=7):
    A = gallery.random_nonsymmetric(n, rng=np.random.default_rng(seed))
    b = np.random.default_rng(seed + 1).standard_normal(n)
    return jnp.asarray(A), jnp.asarray(b), np.linalg.solve(A, b)


def test_idr_nonsymmetric():
    A, b, expected = _nonsym(20)
    x, stats = idr(A, b, s=4, tol=1e-10, maxiter=300)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-6)
    assert bool(stats.reached_tol)


@pytest.mark.parametrize("s", [1, 2, 4, 8])
def test_idr_s_sweep_convection_diffusion(s):
    csr = gallery.convection_diffusion_2d(10)
    A = csr.to_dense_operator()
    b = jnp.ones(100)
    x, stats = idr(A, b, s=s, tol=1e-10, maxiter=600)
    assert bool(stats.reached_tol), f"s={s}: {stats}"
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(csr.todense(), np.ones(100)), atol=1e-5
    )


def test_idr_larger_s_needs_no_more_matvecs():
    # the IDR selling point: on a hard nonsymmetric problem, s=4 should
    # not be slower (in matvecs) than s=1 ~ BiCGStab
    csr = gallery.convection_diffusion_2d(16)
    A = csr.to_dense_operator()
    b = jnp.ones(csr.shape[0])
    _, s1 = idr(A, b, s=1, tol=1e-8, maxiter=2000)
    _, s4 = idr(A, b, s=4, tol=1e-8, maxiter=2000)
    assert bool(s4.reached_tol)
    if bool(s1.reached_tol):
        assert int(s4.iterations) <= int(s1.iterations) * 1.5


def test_idr_with_jacobi_pc():
    from kryst_tpu import JacobiPC

    csr = gallery.convection_diffusion_2d(10)
    A = csr.to_dense_operator()
    b = jnp.ones(100)
    M = JacobiPC.setup(A)
    x_p, st_p = idr(A, b, M=M, s=4, tol=1e-10, maxiter=600)
    assert bool(st_p.reached_tol)
    np.testing.assert_allclose(
        np.asarray(x_p), np.linalg.solve(csr.todense(), np.ones(100)),
        atol=1e-5,
    )


def test_idr_with_ilu_pc_beats_unpreconditioned():
    from kryst_tpu.api import PCConfig

    csr = gallery.convection_diffusion_2d(16)
    A = csr.to_dense_operator()
    b = jnp.ones(csr.shape[0])
    M = PCConfig.ilu0().build(csr, A)
    _, st_plain = idr(A, b, s=4, tol=1e-9, maxiter=2000)
    _, st_ilu = idr(A, b, M=M, s=4, tol=1e-9, maxiter=2000)
    assert bool(st_ilu.reached_tol)
    assert int(st_ilu.iterations) < int(st_plain.iterations)


def test_idr_true_residual_matches_numpy():
    A, b, expected = _nonsym(24, seed=3)
    x, stats = idr(A, b, s=4, tol=1e-9, maxiter=400, true_residual=True)
    r = np.asarray(b) - np.asarray(A) @ np.asarray(x)
    np.testing.assert_allclose(
        float(stats.final_residual), np.linalg.norm(r), rtol=1e-6
    )


def test_idr_explicit_shadow_deterministic():
    A, b, _ = _nonsym(20)
    P = np.linalg.qr(
        np.random.default_rng(11).standard_normal((20, 4))
    )[0]
    x1, s1 = idr(A, b, s=4, shadow=P, tol=1e-10, maxiter=300)
    x2, s2 = idr(A, b, s=4, shadow=P, tol=1e-10, maxiter=300)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    assert int(s1.iterations) == int(s2.iterations)


def test_idr_x0_honored():
    A, b, expected = _nonsym(20)
    x, stats = idr(A, b, x0=jnp.asarray(expected), s=4, tol=1e-8, atol=1e-8)
    assert int(stats.iterations) == 0
    assert bool(stats.reached_tol)


def test_idr_is_jittable():
    A, b, expected = _nonsym(20)

    @jax.jit
    def run(A, b):
        x, st = idr(A, b, s=4, tol=1e-10, maxiter=300)
        return x, st.iterations

    x, its = run(A, b)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-6)
    assert int(its) > 0


def test_idr_singular_breakdown_flagged():
    # singular system: IDR cannot converge; it must stop with a breakdown
    # flag or hit maxiter — and never raise from inside jit
    A = jnp.zeros((8, 8)).at[jnp.arange(7), jnp.arange(7)].set(1.0)
    b = jnp.ones(8)
    x, stats = idr(A, b, s=2, tol=1e-12, maxiter=64)
    assert not bool(stats.reached_tol)
    assert np.isfinite(np.asarray(x)).all()


def test_idr_api_dispatch():
    from kryst_tpu.api import solve

    csr = gallery.convection_diffusion_2d(10)
    b = np.ones(100)
    x, stats = solve(csr, b, solver="idr", pc="jacobi", tol=1e-9, s=4)
    assert bool(stats.reached_tol)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(csr.todense(), b), atol=1e-5
    )


def test_sharded_idr_converges():
    # random shadow spaces differ between mesh sizes, so assert
    # convergence to the true solution (cf. test_sharded_ca_gmres)
    from kryst_tpu.ops.dia import csr_to_dia
    from kryst_tpu.parallel.mesh import solver_mesh
    from kryst_tpu.parallel.sharded import (
        distribute_dia,
        pad_vector,
        sharded_solve,
    )

    mesh = solver_mesh(8)
    a = gallery.convection_diffusion_2d(16)
    A = csr_to_dia(a)
    Ad, n_padded = distribute_dia(A, mesh)
    n = a.shape[0]
    b = np.random.default_rng(0).standard_normal(n)
    bd = pad_vector(jnp.asarray(b), n_padded, mesh)
    xd, sd = sharded_solve(idr, Ad, bd, mesh=mesh, s=4, tol=1e-9, maxiter=1500)
    assert bool(sd.reached_tol)
    np.testing.assert_allclose(
        np.asarray(xd)[:n], np.linalg.solve(a.todense(), b), atol=1e-4
    )
