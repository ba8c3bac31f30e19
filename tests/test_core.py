"""Core layer tests: operators, CSR, convergence semantics
(reference tests/core_dense.rs, src/matrix/sparse.rs:117-145)."""
import jax
import jax.numpy as jnp
import numpy as np

from kryst_tpu import CSRMatrix, DenseOperator, ELLOperator
from kryst_tpu.core.convergence import Convergence
from kryst_tpu.matrix import gallery


def test_dense_matvec_random():
    # randomized matvec vs manual loop (core_dense.rs:16-47)
    rng = np.random.default_rng(0)
    a = rng.standard_normal((7, 5))
    x = rng.standard_normal(5)
    op = DenseOperator(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(op.matvec(jnp.asarray(x))), a @ x, rtol=1e-12)
    y = rng.standard_normal(7)
    np.testing.assert_allclose(
        np.asarray(op.rmatvec(jnp.asarray(y))), a.T @ y, rtol=1e-12
    )


def test_csr_identity_spmv():
    # CSR spmv identity/pattern tests (sparse.rs:117-145)
    eye = CSRMatrix.from_dense(np.eye(5))
    x = np.arange(5.0)
    np.testing.assert_allclose(eye.spmv(x), x)
    ell = eye.to_ell()
    np.testing.assert_allclose(np.asarray(ell.matvec(jnp.asarray(x))), x)


def test_csr_to_ell_roundtrip():
    rng = np.random.default_rng(1)
    dense = rng.standard_normal((8, 8)) * (rng.random((8, 8)) < 0.4)
    csr = CSRMatrix.from_dense(dense)
    ell = csr.to_ell()
    np.testing.assert_allclose(np.asarray(ell.todense()), dense, atol=1e-12)
    x = rng.standard_normal(8)
    np.testing.assert_allclose(
        np.asarray(ell.matvec(jnp.asarray(x))), dense @ x, rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ell.rmatvec(jnp.asarray(x))), dense.T @ x, rtol=1e-10, atol=1e-12
    )


def test_ell_diagonal():
    csr = gallery.poisson_2d(5)
    ell = csr.to_ell()
    np.testing.assert_allclose(np.asarray(ell.diagonal()), np.full(25, 4.0))


def test_csr_submatrix():
    dense = np.arange(36.0).reshape(6, 6)
    csr = CSRMatrix.from_dense(dense)
    idx = [1, 3, 4]
    sub = csr.submatrix(idx)
    np.testing.assert_allclose(sub.todense(), dense[np.ix_(idx, idx)])


def test_csr_transpose():
    rng = np.random.default_rng(2)
    dense = rng.standard_normal((5, 7)) * (rng.random((5, 7)) < 0.5)
    csr = CSRMatrix.from_dense(dense)
    np.testing.assert_allclose(csr.transpose().todense(), dense.T, atol=1e-12)


def test_stencil_2d_matches_csr():
    csr = gallery.poisson_2d(6)
    st = gallery.poisson_2d_stencil(6, dtype=jnp.float64)
    x = np.random.default_rng(3).standard_normal(36)
    np.testing.assert_allclose(
        np.asarray(st.matvec(jnp.asarray(x))), csr.spmv(x), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(st.rmatvec(jnp.asarray(x))), csr.transpose().spmv(x), rtol=1e-12
    )


def test_stencil_3d_matches_csr():
    csr = gallery.poisson_3d(4)
    st = gallery.poisson_3d_stencil(4, dtype=jnp.float64)
    x = np.random.default_rng(4).standard_normal(64)
    np.testing.assert_allclose(
        np.asarray(st.matvec(jnp.asarray(x))), csr.spmv(x), rtol=1e-12
    )


def test_convection_diffusion_nonsymmetric():
    csr = gallery.convection_diffusion_2d(6)
    dense = csr.todense()
    assert not np.allclose(dense, dense.T)


def test_convergence_maxiter_quirk():
    conv = Convergence(tol=1e-8, max_iters=10)
    rel, converged = conv.check(jnp.asarray(1.0), jnp.asarray(1.0), jnp.asarray(10))
    assert bool(converged)  # at max_iters: converged=true (convergence.rs:25)
    rel, converged = conv.check(jnp.asarray(1e-9), jnp.asarray(1.0), jnp.asarray(3))
    assert bool(converged)
    rel, converged = conv.check(jnp.asarray(1.0), jnp.asarray(1.0), jnp.asarray(3))
    assert not bool(converged)


def test_operators_are_pytrees():
    # operators must pass through jit (the whole point of the design)
    csr = gallery.poisson_2d(4)
    ell = csr.to_ell()

    @jax.jit
    def apply(op, x):
        return op.matvec(x)

    x = jnp.ones(16)
    np.testing.assert_allclose(np.asarray(apply(ell, x)), csr.spmv(np.ones(16)))
    dense = DenseOperator(jnp.asarray(csr.todense()))
    np.testing.assert_allclose(np.asarray(apply(dense, x)), csr.spmv(np.ones(16)))
