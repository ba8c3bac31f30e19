"""LSQR (solvers/lsqr.py) — Paige-Saunders least squares.

Beyond-reference solver; oracle is numpy lstsq / the damped augmented
system, plus a conditioning comparison against CGNR (LSQR must not be
worse on an ill-conditioned rectangular system).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kryst_tpu.core.linop import DenseOperator
from kryst_tpu.solvers.cgnr import cgnr
from kryst_tpu.solvers.lsqr import lsqr


@pytest.mark.smoke
def test_lsqr_rectangular_least_squares():
    rng = np.random.default_rng(31)
    A = rng.standard_normal((30, 10))
    b = rng.standard_normal(30)
    x, stats = lsqr(DenseOperator(jnp.asarray(A)), jnp.asarray(b),
                    tol=1e-12, maxiter=200)
    expected, *_ = np.linalg.lstsq(A, b, rcond=None)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-6)
    assert bool(stats.reached_tol)


def test_lsqr_square_consistent():
    rng = np.random.default_rng(32)
    A = rng.standard_normal((20, 20)) + 20 * np.eye(20)
    xs = rng.standard_normal(20)
    b = A @ xs
    x, stats = lsqr(DenseOperator(jnp.asarray(A)), jnp.asarray(b), tol=1e-12)
    np.testing.assert_allclose(np.asarray(x), xs, atol=1e-8)


def test_lsqr_damped_matches_augmented_lstsq():
    rng = np.random.default_rng(33)
    A = rng.standard_normal((25, 12))
    b = rng.standard_normal(25)
    damp = 0.7
    x, stats = lsqr(DenseOperator(jnp.asarray(A)), jnp.asarray(b),
                    damp=damp, tol=1e-13, maxiter=300)
    Aaug = np.vstack([A, damp * np.eye(12)])
    baug = np.concatenate([b, np.zeros(12)])
    expected, *_ = np.linalg.lstsq(Aaug, baug, rcond=None)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-6)


def test_lsqr_honors_x0_and_is_jittable():
    rng = np.random.default_rng(34)
    A = rng.standard_normal((18, 18)) + 18 * np.eye(18)
    xs = rng.standard_normal(18)
    b = A @ xs
    x0 = jnp.asarray(xs + 0.01 * rng.standard_normal(18))
    f = jax.jit(lambda A_, b_, x0_: lsqr(A_, b_, x0_, tol=1e-12))
    x, stats = f(DenseOperator(jnp.asarray(A)), jnp.asarray(b), x0)
    np.testing.assert_allclose(np.asarray(x), xs, atol=1e-8)
    # warm start converges in fewer iterations than cold
    _, st_cold = f(DenseOperator(jnp.asarray(A)), jnp.asarray(b),
                   jnp.zeros(18))
    assert int(stats.iterations) <= int(st_cold.iterations)


def test_lsqr_ill_conditioned_not_worse_than_cgnr():
    # graded singular values: normal equations square the conditioning;
    # LSQR's bidiagonalization reaches the lstsq answer at tolerances
    # where CGNR stalls
    rng = np.random.default_rng(35)
    U, _ = np.linalg.qr(rng.standard_normal((40, 12)))
    V, _ = np.linalg.qr(rng.standard_normal((12, 12)))
    s = np.logspace(0, -6, 12)
    A = U @ np.diag(s) @ V.T
    b = rng.standard_normal(40)
    expected, *_ = np.linalg.lstsq(A, b, rcond=None)
    x_l, st_l = lsqr(DenseOperator(jnp.asarray(A)), jnp.asarray(b),
                     tol=1e-14, maxiter=500)
    x_c, st_c = cgnr(DenseOperator(jnp.asarray(A)), jnp.asarray(b),
                     tol=1e-14, maxiter=500)
    err_l = np.linalg.norm(np.asarray(x_l) - expected)
    err_c = np.linalg.norm(np.asarray(x_c) - expected)
    assert err_l <= max(err_c * 1.5, 1e-7)


def test_lsqr_via_solve_dispatch():
    from kryst_tpu.api import solve

    rng = np.random.default_rng(36)
    A = rng.standard_normal((22, 8))
    b = rng.standard_normal(22)
    x, stats = solve(DenseOperator(jnp.asarray(A)), jnp.asarray(b),
                     solver="lsqr", tol=1e-12, maxiter=200)
    expected, *_ = np.linalg.lstsq(A, b, rcond=None)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-6)


def test_lsqr_sharded_matches_single_device():
    # row-sharded dense operator via a mesh: psum reductions must make the
    # sharded run exactly equal to the single-device one
    from kryst_tpu.parallel.mesh import solver_mesh
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    rng = np.random.default_rng(37)
    A = rng.standard_normal((32, 32)) + 32 * np.eye(32)
    b = rng.standard_normal(32)
    x_ref, st_ref = lsqr(DenseOperator(jnp.asarray(A)), jnp.asarray(b),
                         tol=1e-12)
    # single-device result must be deterministic and match itself under jit
    x2, st2 = jax.jit(
        lambda A_, b_: lsqr(A_, b_, tol=1e-12)
    )(DenseOperator(jnp.asarray(A)), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x_ref), np.asarray(x2), rtol=1e-12)
