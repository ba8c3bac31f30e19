"""DeflationPC (A-DEF2 two-level) tests — pc/deflation.py, beyond
reference. The quantitative claim under test: deflating the lowest
eigenvectors of an SPD operator cuts PCG iterations (the effective
condition number drops to lambda_max / lambda_{k+1})."""
import jax
import jax.numpy as jnp
import numpy as np

from kryst_tpu import JacobiPC, pcg
from kryst_tpu.matrix import gallery
from kryst_tpu.pc.deflation import DeflationPC


def _poisson(n_grid=24):
    a = gallery.poisson_2d(n_grid)
    A = a.to_dense_operator()
    n = n_grid * n_grid
    b = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    return a, A, b, n


def test_deflation_exact_eigenvectors_cut_iterations():
    a, A, b, n = _poisson()
    dense = np.asarray(a.todense())
    w, V = np.linalg.eigh(dense)
    W = jnp.asarray(V[:, :6])  # lowest 6 modes

    Mj = JacobiPC.setup(A)
    _, st_plain = pcg(A, b, M=Mj, tol=1e-10, maxiter=2000)
    Md = DeflationPC.setup(A, W, inner=Mj)
    x, st_def = pcg(A, b, M=Md, tol=1e-10, maxiter=2000)

    assert bool(st_def.reached_tol)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(dense, np.asarray(b)), atol=1e-6
    )
    assert int(st_def.iterations) < int(st_plain.iterations)


def test_deflation_identity_inner():
    a, A, b, n = _poisson(16)
    dense = np.asarray(a.todense())
    w, V = np.linalg.eigh(dense)
    Md = DeflationPC.setup(A, jnp.asarray(V[:, :4]))  # no inner smoother
    _, st_plain = pcg(A, b, tol=1e-10, maxiter=2000)
    x, st = pcg(A, b, M=Md, tol=1e-10, maxiter=2000)
    assert bool(st.reached_tol)
    assert int(st.iterations) < int(st_plain.iterations)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(dense, np.asarray(b)), atol=1e-6
    )


def test_deflation_with_lobpcg_basis():
    # the production pattern: one eigensolve, then deflate every
    # subsequent solve with the computed near-kernel block
    from kryst_tpu.solvers.lobpcg import lobpcg

    a, A, b, n = _poisson(20)
    X0 = jnp.asarray(np.random.default_rng(1).standard_normal((n, 4)))
    Mj = JacobiPC.setup(A)
    w, X, est = lobpcg(A, X0, M=None, tol=1e-8, maxiter=300)

    Md = DeflationPC.setup(A, X, inner=Mj)
    _, st_plain = pcg(A, b, M=Mj, tol=1e-10, maxiter=2000)
    x, st_def = pcg(A, b, M=Md, tol=1e-10, maxiter=2000)
    assert bool(st_def.reached_tol)
    assert int(st_def.iterations) < int(st_plain.iterations)
    np.testing.assert_allclose(
        np.asarray(x),
        np.linalg.solve(np.asarray(a.todense()), np.asarray(b)),
        atol=1e-6,
    )


def test_deflation_is_jittable_pytree():
    a, A, b, n = _poisson(12)
    V = np.linalg.eigh(np.asarray(a.todense()))[1]
    Md = DeflationPC.setup(A, jnp.asarray(V[:, :3]), inner=JacobiPC.setup(A))

    @jax.jit
    def run(A, b, M):
        x, st = pcg(A, b, M=M, tol=1e-10, maxiter=500)
        return x, st.iterations

    x, its = run(A, b, Md)
    np.testing.assert_allclose(
        np.asarray(x),
        np.linalg.solve(np.asarray(a.todense()), np.asarray(b)),
        atol=1e-6,
    )
    assert int(its) > 0


def test_sharded_deflated_pcg_matches_single_device():
    # 8-device mesh: row-sharded W/AW via partition_spec, replicated
    # Cholesky factor, psum'd projections — identical iteration space
    import dataclasses as _dc

    from kryst_tpu.ops.dia import csr_to_dia
    from kryst_tpu.parallel.mesh import solver_mesh
    from kryst_tpu.parallel.sharded import (
        distribute_dia,
        pad_vector,
        sharded_solve,
    )

    mesh = solver_mesh(8)
    n_grid = 24
    a = gallery.poisson_2d(n_grid)
    A = csr_to_dia(a)
    Ad, n_padded = distribute_dia(A, mesh)
    n = n_grid * n_grid
    b = np.random.default_rng(0).standard_normal(n)
    bd = pad_vector(jnp.asarray(b), n_padded, mesh)

    V = np.linalg.eigh(np.asarray(a.todense()))[1]
    W = jnp.asarray(V[:, :4])
    M1 = DeflationPC.setup(A, W, inner=JacobiPC.setup(A))
    x1, s1 = pcg(A, jnp.asarray(b), M=M1, tol=1e-10, maxiter=2000)

    pad = n_padded - n
    Md = _dc.replace(
        M1,
        W=jnp.pad(M1.W, ((0, pad), (0, 0))),
        AW=jnp.pad(M1.AW, ((0, pad), (0, 0))),
        inner=JacobiPC.from_diagonal(
            jnp.pad(1.0 / M1.inner.inv_diag, (0, pad), constant_values=1.0)
        ),
        axis_name="shards",
    )
    xd, sd = sharded_solve(pcg, Ad, bd, mesh=mesh, M=Md, tol=1e-10, maxiter=2000)
    np.testing.assert_allclose(np.asarray(xd)[:n], np.asarray(x1), atol=1e-7)
    assert abs(int(sd.iterations) - int(s1.iterations)) <= 1


def test_deflation_single_vector_and_ridge():
    a, A, b, n = _poisson(12)
    V = np.linalg.eigh(np.asarray(a.todense()))[1]
    # 1-D basis is promoted to (n, 1); ridge keeps a duplicate basis sane
    Md = DeflationPC.setup(A, jnp.asarray(V[:, 0]))
    x, st = pcg(A, b, M=Md, tol=1e-10, maxiter=2000)
    assert bool(st.reached_tol)
    Wdup = jnp.stack([jnp.asarray(V[:, 0]), jnp.asarray(V[:, 0]) * (1 + 1e-14)], axis=1)
    Md2 = DeflationPC.setup(A, Wdup, shift=1e-8)
    x2, st2 = pcg(A, b, M=Md2, tol=1e-8, maxiter=2000)
    assert np.isfinite(np.asarray(x2)).all()
