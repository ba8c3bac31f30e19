"""LOBPCG eigensolver (solvers/lobpcg.py) + the jit-safe small-matrix
Jacobi eigensolver it is built on (utils/smalleig.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kryst_tpu.matrix.gallery import poisson_2d
from kryst_tpu.solvers.lobpcg import lobpcg
from kryst_tpu.utils.smalleig import jacobi_eigh


@pytest.mark.parametrize("m", [3, 17, 48])
def test_jacobi_eigh_matches_lapack(m):
    rng = np.random.default_rng(m)
    S = rng.standard_normal((m, m))
    S = (S + S.T) / 2
    w, V = jacobi_eigh(jnp.asarray(S))
    we, Ve = np.linalg.eigh(S)
    np.testing.assert_allclose(np.asarray(w), we, atol=1e-12 * max(1, abs(we).max()))
    # eigenvectors up to sign: check reconstruction + orthonormality
    np.testing.assert_allclose(
        np.asarray(V) @ np.diag(np.asarray(w)) @ np.asarray(V).T, S, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(V).T @ np.asarray(V), np.eye(m), atol=1e-12
    )


@pytest.mark.smoke
def test_lobpcg_smallest_poisson():
    a = poisson_2d(24)  # 576 dof
    A = a.to_dense_operator()
    n = a.shape[0]
    k = 4
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(rng.standard_normal((n, k)))
    w, X, st = lobpcg(A, X0, tol=1e-9, maxiter=300)
    dense = np.asarray(A.todense() if hasattr(A, "todense") else A.A)
    we = np.linalg.eigvalsh(dense)[:k]
    np.testing.assert_allclose(np.asarray(w), we, rtol=1e-7)
    assert bool(st.converged)
    # eigenvectors: A X ≈ X diag(w)
    R = dense @ np.asarray(X) - np.asarray(X) @ np.diag(np.asarray(w))
    assert np.abs(R).max() < 1e-6


def test_lobpcg_largest_poisson():
    a = poisson_2d(16)
    A = a.to_dense_operator()
    n = a.shape[0]
    rng = np.random.default_rng(1)
    X0 = jnp.asarray(rng.standard_normal((n, 3)))
    w, X, st = lobpcg(A, X0, tol=1e-8, maxiter=300, largest=True)
    dense = np.asarray(A.todense())
    we = np.linalg.eigvalsh(dense)
    np.testing.assert_allclose(sorted(np.asarray(w)), we[-3:], rtol=1e-6)


def test_lobpcg_preconditioned_converges_faster():
    from kryst_tpu.pc.gmg import GMGPC

    a = poisson_2d(32)
    A = a.to_device_operator(grid=(32, 32))
    n = a.shape[0]
    rng = np.random.default_rng(2)
    X0 = jnp.asarray(rng.standard_normal((n, 2)))
    M = GMGPC.setup(a, grid=(32, 32), coarse_size=64)
    w_pc, _, st_pc = lobpcg(A, X0, M=M, tol=1e-8, maxiter=200)
    w_np, _, st_np = lobpcg(A, X0, tol=1e-8, maxiter=200)
    assert bool(st_pc.converged)
    # the multigrid-preconditioned run needs (much) fewer iterations
    assert int(st_pc.iterations) < int(st_np.iterations)
    # both agree with the true spectrum
    import scipy.sparse as sp

    As = sp.csr_matrix(
        (a.data.astype(np.float64), a.indices, a.indptr), shape=a.shape
    ).toarray()
    we = np.linalg.eigvalsh(As)[:2]
    np.testing.assert_allclose(np.asarray(w_pc), we, rtol=1e-6)


def test_lobpcg_is_jittable():
    a = poisson_2d(12)
    A = a.to_dense_operator()
    rng = np.random.default_rng(3)
    X0 = jnp.asarray(rng.standard_normal((a.shape[0], 2)))
    f = jax.jit(lambda A_, X_: lobpcg(A_, X_, tol=1e-8, maxiter=200))
    w, X, st = f(A, X0)
    we = np.linalg.eigvalsh(np.asarray(A.todense()))[:2]
    np.testing.assert_allclose(np.asarray(w), we, rtol=1e-6)


def test_lobpcg_sharded_matches_single_device():
    """Row-sharded mesh run must match the single-device eigenvalues."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    a = poisson_2d(16)  # 256 rows = 32/device
    n = a.shape[0]
    dense = jnp.asarray(
        np.asarray(
            a.todense() if hasattr(a, "todense") else None
        )
    )
    rng = np.random.default_rng(4)
    X0 = jnp.asarray(rng.standard_normal((n, 2)))

    from kryst_tpu.core.linop import DenseOperator, FunctionOperator

    w_ref, _, _ = lobpcg(DenseOperator(dense), X0, tol=1e-9, maxiter=300)

    mesh = Mesh(np.array(devs[:8]), ("rows",))

    def run(Arows, Xs):
        # Arows: this shard's rows of the dense matrix (n/8, n)
        Aop = FunctionOperator(
            mv=lambda v: Arows @ jax.lax.all_gather(v, "rows").reshape(-1),
            shape=(Arows.shape[0], Arows.shape[0]),
        )
        w, X, st = lobpcg(Aop, Xs, tol=1e-9, maxiter=300, axis_name="rows")
        return w

    w_sh = shard_map(
        run, mesh=mesh,
        in_specs=(P("rows", None), P("rows", None)),
        out_specs=P(),
        check_rep=False,
    )(dense, X0)
    np.testing.assert_allclose(np.asarray(w_sh), np.asarray(w_ref), rtol=1e-8)
