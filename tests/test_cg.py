"""CG/PCG tests mirroring the reference's unit + integration strategy
(reference cg.rs tests, pcg.rs:253-275, tests/solver_iterative.rs,
tests/preconditioner_integration.rs)."""
import jax.numpy as jnp
import numpy as np
import pytest

from kryst_tpu import (
    Breakdown,
    DenseOperator,
    FunctionOperator,
    JacobiPC,
    NormType,
    cg,
    pcg,
)
from kryst_tpu.matrix import gallery


def test_cg_small_spd_closed_form():
    # 2x2 SPD with known solution (reference cg.rs:309-356 style fixture)
    A = jnp.array([[4.0, 1.0], [1.0, 3.0]])
    b = jnp.array([1.0, 2.0])
    x, stats = cg(A, b, tol=1e-12, maxiter=10)
    expected = jnp.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(expected), rtol=1e-10)
    assert bool(stats.reached_tol)
    assert int(stats.breakdown) == Breakdown.NONE


def test_cg_vs_direct_random_spd():
    # iterative-vs-direct cross-validation (solver_iterative.rs:18-50)
    A = gallery.random_spd(50)
    b = np.random.default_rng(2).standard_normal(50)
    x, stats = cg(jnp.asarray(A), jnp.asarray(b), tol=1e-12, maxiter=500)
    expected = np.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-6)
    assert bool(stats.reached_tol)


def test_cg_matrix_free_operator():
    # solver logic decoupled from storage (the DenseMat fake-backend pattern)
    A = jnp.array([[2.0, 0.0], [0.0, 5.0]])
    op = FunctionOperator(mv=lambda v: A @ v, rmv=lambda v: A.T @ v, shape=(2, 2))
    b = jnp.array([2.0, 10.0])
    x, stats = cg(op, b, tol=1e-12)
    np.testing.assert_allclose(np.asarray(x), [1.0, 2.0], rtol=1e-10)


def test_cg_single_reduction_equivalence():
    # single_reduction ≡ standard (reference cg.rs:358-415)
    A = gallery.random_spd(40)
    b = np.random.default_rng(3).standard_normal(40)
    x1, s1 = cg(jnp.asarray(A), jnp.asarray(b), tol=1e-10, maxiter=200)
    x2, s2 = cg(
        jnp.asarray(A), jnp.asarray(b), tol=1e-10, maxiter=200, single_reduction=True
    )
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-7)
    assert abs(int(s1.iterations) - int(s2.iterations)) <= 2


def test_cg_indefinite_breakdown():
    A = jnp.array([[1.0, 0.0], [0.0, -1.0]])  # indefinite
    b = jnp.array([0.0, 1.0])
    x, stats = cg(A, b, tol=1e-12, maxiter=10)
    assert int(stats.breakdown) == Breakdown.INDEFINITE_MATRIX


def test_cg_trust_region_boundary():
    # Steihaug–Toint: solution is clipped to ||x|| <= radius
    A = jnp.eye(2)
    b = jnp.array([10.0, 0.0])  # unconstrained solution norm 10
    x, stats = cg(A, b, tol=1e-12, maxiter=10, radius=1.0)
    assert np.linalg.norm(np.asarray(x)) <= 1.0 + 1e-8


def test_cg_maxiter_converged_quirk():
    # Convergence::check reports converged=true at max_iters (convergence.rs:25)
    A = gallery.random_spd(30)
    b = np.ones(30)
    x, stats = cg(jnp.asarray(A), jnp.asarray(b), tol=1e-16, maxiter=3)
    assert bool(stats.converged)  # reference semantics
    assert not bool(stats.reached_tol)  # honest flag


def test_pcg_jacobi_ill_conditioned_diagonal():
    # Jacobi PC solves a diagonal system in O(1) iterations
    # (preconditioner_integration.rs ill-conditioned fixture, cond 1e6)
    D = gallery.ill_conditioned_diag(50, cond=1e6)
    b = np.ones(50)
    M = JacobiPC.setup(jnp.asarray(D))
    x, stats = pcg(jnp.asarray(D), jnp.asarray(b), M=M, tol=1e-10, maxiter=50)
    np.testing.assert_allclose(np.asarray(x), 1.0 / np.diag(D), rtol=1e-8)
    assert int(stats.iterations) <= 3


def test_pcg_vs_cg_identity_pc():
    A = gallery.random_spd(30)
    b = np.random.default_rng(4).standard_normal(30)
    x1, s1 = cg(jnp.asarray(A), jnp.asarray(b), tol=1e-10, maxiter=100)
    x2, s2 = pcg(jnp.asarray(A), jnp.asarray(b), M=None, tol=1e-10, maxiter=100)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-8)
    assert int(s1.iterations) == int(s2.iterations)


def test_pcg_single_reduction_equivalence():
    # pcg.rs:253-275 equivalence test
    A = gallery.poisson_2d(12).to_dense_operator()
    b = jnp.ones(144)
    M = JacobiPC.setup(A)
    x1, s1 = pcg(A, b, M=M, tol=1e-10, maxiter=400)
    x2, s2 = pcg(A, b, M=M, tol=1e-10, maxiter=400, single_reduction=True)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-7)
    assert abs(int(s1.iterations) - int(s2.iterations)) <= 2


def test_pcg_norm_types_all_converge():
    A = gallery.poisson_2d(10).to_dense_operator()
    b = jnp.ones(100)
    M = JacobiPC.setup(A)
    expected = np.linalg.solve(np.asarray(A.a), np.asarray(b))
    for nt in (NormType.UNPRECONDITIONED, NormType.PRECONDITIONED, NormType.NATURAL):
        x, stats = pcg(A, b, M=M, tol=1e-10, maxiter=400, norm_type=nt)
        np.testing.assert_allclose(np.asarray(x), expected, atol=1e-6)


def test_cg_n_step_exactness():
    # CG converges in at most n iterations in exact arithmetic
    # (preconditioner_integration.rs:137)
    n = 24
    A = gallery.tridiag(n).to_dense_operator()
    b = jnp.ones(n)
    x, stats = cg(A, b, tol=1e-10, maxiter=n + 2)
    assert int(stats.iterations) <= n + 1
    assert bool(stats.reached_tol)


def test_cg_residual_history():
    A = gallery.poisson_2d(8).to_dense_operator()
    b = jnp.ones(64)
    x, stats = cg(A, b, tol=1e-10, maxiter=200, record_history=True)
    hist = np.asarray(stats.residual_history)
    its = int(stats.iterations)
    assert np.isfinite(hist[: its + 1]).all()
    # monotone-ish decrease overall: final < initial
    assert hist[its] < hist[0]
    assert np.isnan(hist[its + 1 :]).all()


def test_cg_ell_matches_dense():
    csr = gallery.poisson_2d(9)
    Ae = csr.to_ell()
    Ad = csr.to_dense_operator()
    b = jnp.ones(81)
    x1, s1 = cg(Ae, b, tol=1e-10, maxiter=300)
    x2, s2 = cg(Ad, b, tol=1e-10, maxiter=300)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-9)
    assert int(s1.iterations) == int(s2.iterations)


def test_cg_stencil_matches_csr():
    csr = gallery.poisson_2d(9)
    Ast = gallery.poisson_2d_stencil(9, dtype=jnp.float64)
    b = jnp.ones(81)
    x1, _ = cg(Ast, b, tol=1e-10, maxiter=300)
    x2, _ = cg(csr.to_dense_operator(), b, tol=1e-10, maxiter=300)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-9)
