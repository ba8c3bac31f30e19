"""Block GMRES tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import csr_to_dia
from kryst_tpu.solvers.block_gmres import block_gmres
from kryst_tpu.solvers.gmres import gmres


def _dense(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape).toarray()


def _rhs(n, k, seed=0):
    return np.random.default_rng(seed).standard_normal((n, k))


@pytest.mark.smoke
def test_block_gmres_matches_direct():
    a = gallery.convection_diffusion_2d(12, beta=8.0)
    A = csr_to_dia(a, dtype=np.float64)
    B = jnp.asarray(_rhs(144, 4))
    X, st = block_gmres(A, B, tol=1e-10, maxiter=600, restart=12)
    assert bool(jnp.all(st.reached_tol)), np.asarray(st.rel_residual)
    expected = np.linalg.solve(_dense(a), np.asarray(B))
    np.testing.assert_allclose(np.asarray(X), expected, atol=1e-7)


def test_block_gmres_right_preconditioned():
    from kryst_tpu.pc.ilu import ilu0

    a = gallery.convection_diffusion_2d(12, beta=8.0)
    A = csr_to_dia(a, dtype=np.float64)
    B = jnp.asarray(_rhs(144, 3, seed=2))
    X, st = block_gmres(A, B, M=ilu0(a), tol=1e-10, maxiter=400, restart=10)
    assert bool(jnp.all(st.reached_tol))
    expected = np.linalg.solve(_dense(a), np.asarray(B))
    np.testing.assert_allclose(np.asarray(X), expected, atol=1e-7)


def test_block_gmres_no_slower_than_worst_column():
    a = gallery.convection_diffusion_2d(14, beta=5.0)
    A = csr_to_dia(a, dtype=np.float64)
    B = jnp.asarray(_rhs(196, 5, seed=4))
    X, st = block_gmres(A, B, tol=1e-8, maxiter=800, restart=16)
    assert bool(jnp.all(st.reached_tol))
    worst = 0
    for j in range(5):
        _, s1 = gmres(A, B[:, j], tol=1e-8, maxiter=800, restart=16)
        worst = max(worst, int(s1.iterations))
    # shared space: no more restart cycles than the worst column alone
    assert int(st.iterations) <= worst + 16


def test_block_gmres_rank_deficient_block():
    a = gallery.convection_diffusion_2d(10)
    A = csr_to_dia(a, dtype=np.float64)
    b = _rhs(100, 1, seed=7).ravel()
    B = jnp.asarray(np.stack([b, b, -0.5 * b], axis=1))
    X, st = block_gmres(A, B, tol=1e-9, maxiter=400, restart=10)
    assert np.all(np.isfinite(np.asarray(X)))
    expected = np.linalg.solve(_dense(a), np.asarray(B))
    np.testing.assert_allclose(np.asarray(X), expected, atol=1e-6)


def test_block_gmres_x0():
    a = gallery.convection_diffusion_2d(10)
    A = csr_to_dia(a, dtype=np.float64)
    B = jnp.asarray(_rhs(100, 2, seed=8))
    expected = np.linalg.solve(_dense(a), np.asarray(B))
    X0 = jnp.asarray(expected + 1e-2 * _rhs(100, 2, seed=9))
    X, st = block_gmres(A, B, X0, tol=1e-10, maxiter=400, restart=10)
    assert bool(jnp.all(st.reached_tol))
    np.testing.assert_allclose(np.asarray(X), expected, atol=1e-7)


def test_solve_dispatches_block_gmres():
    from kryst_tpu.api import solve

    a = gallery.convection_diffusion_2d(12, beta=8.0)
    dense = _dense(a)
    B = np.asarray(_rhs(144, 3))
    X, st = solve(a, B, solver="block_gmres", pc="ilu0", tol=1e-8, restart=10)
    assert X.shape == B.shape
    assert np.abs(dense @ np.asarray(X, np.float64) - B).max() < 1e-3


def test_block_gmres_sharded_equivalence():
    """Same answer inside an 8-device shard_map (psum panels/Grams)."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    a = gallery.convection_diffusion_2d(16, beta=4.0)  # 256 = 8 * 32
    A = csr_to_dia(a, dtype=np.float64)
    B = jnp.asarray(_rhs(256, 2, seed=11))
    X_ref, st_ref = block_gmres(A, B, tol=1e-9, maxiter=400, restart=10)

    from kryst_tpu.parallel.sharded import (
        HaloDIAOperator, distribute_dia, solver_mesh,
    )

    mesh = solver_mesh(8)
    Ad, n_pad = distribute_dia(A, mesh)
    assert n_pad == 256

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, "shards"), P("shards", None)),
        out_specs=(P("shards", None), P()),
    )
    def run(data, Bs):
        op = HaloDIAOperator(
            data=data, offsets=Ad.offsets, halo=Ad.halo,
            n_shards=Ad.n_shards, axis_name="shards",
        )
        X, st = block_gmres(op, Bs, tol=1e-9, maxiter=400, restart=10,
                            axis_name="shards")
        return X, st.iterations

    X_sh, its = run(Ad.data, B)
    np.testing.assert_allclose(np.asarray(X_sh), np.asarray(X_ref), atol=1e-7)
    assert int(its) == int(st_ref.iterations)
