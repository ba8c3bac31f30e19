"""Tests for BiCGStab, CGS, QMR, TFQMR, MINRES, CGNR/CGNE and direct LU/QR
(reference bicgstab.rs:315-328, cgs.rs:160-189, qmr.rs:174-196,
tfqmr.rs, minres.rs, cgnr.rs, direct_lu.rs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kryst_tpu.matrix import gallery
from kryst_tpu.solvers.bicgstab import bicgstab
from kryst_tpu.solvers.cgnr import cgne, cgnr
from kryst_tpu.solvers.cgs import cgs
from kryst_tpu.solvers.direct import lu_factor, lu_solve, qr_factor, qr_solve
from kryst_tpu.solvers.minres import minres
from kryst_tpu.solvers.qmr import qmr
from kryst_tpu.solvers.tfqmr import tfqmr
from kryst_tpu.core.linop import DenseOperator


def _nonsym(n=20, seed=7):
    A = gallery.random_nonsymmetric(n, rng=np.random.default_rng(seed))
    b = np.random.default_rng(seed + 1).standard_normal(n)
    return jnp.asarray(A), jnp.asarray(b), np.linalg.solve(A, b)


# ---------------------------------------------------------------- BiCGStab
def test_bicgstab_nonsymmetric():
    # bicgstab.rs:315-328 nonsymmetric fixture
    A, b, expected = _nonsym(20)
    x, stats = bicgstab(A, b, tol=1e-10, maxiter=200)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-6)
    assert bool(stats.reached_tol)


def test_bicgstab_convection_diffusion():
    csr = gallery.convection_diffusion_2d(10)
    A = csr.to_dense_operator()
    b = jnp.ones(100)
    x, stats = bicgstab(A, b, tol=1e-10, maxiter=500)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(csr.todense(), np.ones(100)), atol=1e-5
    )


def test_bicgstab_with_jacobi_pc():
    from kryst_tpu import JacobiPC

    csr = gallery.convection_diffusion_2d(10)
    A = csr.to_dense_operator()
    b = jnp.ones(100)
    M = JacobiPC.setup(A)
    x, stats = bicgstab(A, b, M=M, tol=1e-10, maxiter=500)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(csr.todense(), np.ones(100)), atol=1e-5
    )


# ---------------------------------------------------------------- CGS
def test_cgs_diagonally_dominant():
    # cgs.rs:160-189: diagonally-dominant 5x5
    A = jnp.asarray(gallery.tridiag(5, diag=4.0).todense())
    b = jnp.ones(5)
    x, stats = cgs(A, b, tol=1e-10, maxiter=50)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(np.asarray(A), np.ones(5)), atol=1e-8
    )
    assert bool(stats.reached_tol)


def test_cgs_nonsymmetric():
    A, b, expected = _nonsym(15, seed=9)
    x, stats = cgs(A, b, tol=1e-10, maxiter=200)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-5)


# ---------------------------------------------------------------- QMR
def test_qmr_nonsymmetric():
    # qmr.rs:174-196 (the reference's own test is #[ignore]d; ours runs)
    A, b, expected = _nonsym(15, seed=11)
    x, stats = qmr(A, b, tol=1e-9, maxiter=200)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-5)
    assert bool(stats.reached_tol)


def test_qmr_requires_rmatvec():
    # QMR uses A^T (qmr.rs:121-124): FunctionOperator without rmv must fail
    from kryst_tpu.core.linop import FunctionOperator

    op = FunctionOperator(mv=lambda v: v, shape=(3, 3))
    with pytest.raises(NotImplementedError):
        qmr(op, jnp.ones(3), maxiter=3)


# ---------------------------------------------------------------- TFQMR
def test_tfqmr_nonsymmetric():
    A, b, expected = _nonsym(15, seed=13)
    x, stats = tfqmr(A, b, tol=1e-9, maxiter=200)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-5)
    assert float(stats.rel_residual) < 1e-6


def test_tfqmr_spd():
    csr = gallery.poisson_2d(8)
    A = csr.to_dense_operator()
    b = jnp.ones(64)
    x, stats = tfqmr(A, b, tol=1e-9, maxiter=300)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(csr.todense(), np.ones(64)), atol=1e-5
    )


# ---------------------------------------------------------------- MINRES
def test_minres_spd():
    csr = gallery.poisson_2d(8)
    A = csr.to_dense_operator()
    b = jnp.ones(64)
    x, stats = minres(A, b, tol=1e-10, maxiter=300)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(csr.todense(), np.ones(64)), atol=1e-6
    )
    assert bool(stats.reached_tol)


def test_minres_symmetric_indefinite():
    # the MINRES selling point: symmetric but indefinite
    rng = np.random.default_rng(17)
    Q, _ = np.linalg.qr(rng.standard_normal((20, 20)))
    eigs = np.concatenate([np.linspace(1, 5, 12), -np.linspace(1, 3, 8)])
    A = Q @ np.diag(eigs) @ Q.T
    b = rng.standard_normal(20)
    x, stats = minres(jnp.asarray(A), jnp.asarray(b), tol=1e-9, maxiter=200)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), atol=1e-5)
    assert bool(stats.reached_tol)


def test_minres_true_residual_mode():
    csr = gallery.poisson_2d(6)
    A = csr.to_dense_operator()
    b = jnp.ones(36)
    x, stats = minres(A, b, tol=1e-10, maxiter=200, true_residual=True)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(csr.todense(), np.ones(36)), atol=1e-6
    )


# ---------------------------------------------------------------- CGNR/CGNE
def test_cgnr_nonsymmetric_square():
    # the reference's A^T bug (cgnr.rs:90) made nonsymmetric systems wrong;
    # ours must solve them correctly
    A, b, expected = _nonsym(15, seed=19)
    x, stats = cgnr(A, b, tol=1e-12, maxiter=500)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-4)


def test_cgnr_rectangular_least_squares():
    rng = np.random.default_rng(21)
    A = rng.standard_normal((30, 10))
    b = rng.standard_normal(30)
    x, stats = cgnr(DenseOperator(jnp.asarray(A)), jnp.asarray(b), tol=1e-12, maxiter=200)
    expected, *_ = np.linalg.lstsq(A, b, rcond=None)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-6)


def test_cgne_underdetermined_min_norm():
    rng = np.random.default_rng(23)
    A = rng.standard_normal((10, 30))
    b = rng.standard_normal(10)
    x, stats = cgne(DenseOperator(jnp.asarray(A)), jnp.asarray(b), tol=1e-12, maxiter=200)
    expected = np.linalg.pinv(A) @ b  # minimum-norm solution
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-6)


def test_cgnr_symmetric_matches_reference_behavior():
    # on symmetric A the reference's matvec-for-rmatvec quirk is harmless;
    # verify our fixed version still solves those systems identically
    A = jnp.asarray(gallery.tridiag(10, diag=3.0).todense())
    b = jnp.ones(10)
    x, stats = cgnr(A, b, tol=1e-12, maxiter=100)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(np.asarray(A), np.ones(10)), atol=1e-8
    )


# ---------------------------------------------------------------- direct
def test_lu_solve_and_cache():
    rng = np.random.default_rng(25)
    A = rng.standard_normal((20, 20)) + 10 * np.eye(20)
    state = lu_factor(jnp.asarray(A))
    for seed in (1, 2):
        b = np.random.default_rng(seed).standard_normal(20)
        x, stats = lu_solve(state, jnp.asarray(b))  # cached reuse
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), atol=1e-9)
        assert bool(stats.converged)


def test_qr_solve_square():
    rng = np.random.default_rng(27)
    A = rng.standard_normal((15, 15)) + 8 * np.eye(15)
    b = rng.standard_normal(15)
    x, stats = qr_solve(jnp.asarray(A), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), atol=1e-9)


def test_qr_solve_rectangular():
    # rectangular least-squares (direct_lu.rs:99-142)
    rng = np.random.default_rng(29)
    A = rng.standard_normal((25, 10))
    b = rng.standard_normal(25)
    x, stats = qr_solve(jnp.asarray(A), jnp.asarray(b))
    expected, *_ = np.linalg.lstsq(A, b, rcond=None)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-9)


def test_vmap_batched_multi_rhs():
    """Solvers are pure pytree functions, so multi-RHS batching is just
    jax.vmap — each lane converges independently (while_loop lifts to a
    masked batched loop under vmap). A capability the reference's
    imperative solvers cannot express (cf. src/solver/cg.rs:141)."""
    from kryst_tpu import JacobiPC, pcg
    from kryst_tpu.solvers.gmres import gmres

    a = gallery.poisson_2d(32)
    A = a.to_device_operator(dtype=jnp.float64)
    M = JacobiPC.setup(A)
    B = jnp.asarray(np.random.default_rng(0).standard_normal((4, 1024)))
    X = jax.jit(jax.vmap(lambda bb: pcg(A, bb, M=M, tol=1e-10, maxiter=300)[0]))(B)
    for i in range(4):
        x_i, st = pcg(A, B[i], M=M, tol=1e-10, maxiter=300)
        assert bool(st.reached_tol)
        np.testing.assert_allclose(np.asarray(X[i]), np.asarray(x_i), atol=1e-8)
    Xg = jax.jit(jax.vmap(
        lambda bb: gmres(A, bb, tol=1e-10, maxiter=300, restart=30)[0]
    ))(B)
    res = jnp.linalg.norm(B - jax.vmap(A.matvec)(Xg), axis=1)
    assert float(jnp.max(res)) < 1e-7
