"""Block PCG (solvers/block_cg.py) — beyond-reference multi-RHS solver."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from kryst_tpu import JacobiPC
from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import csr_to_dia, dia_spmv_xla_block
from kryst_tpu.solvers.block_cg import block_pcg, matvec_block
from kryst_tpu.solvers.cg import pcg


def _dense(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape).toarray()


def _rhs_block(n, k, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, k))


def test_matvec_block_matches_per_column():
    a = gallery.convection_diffusion_2d(12, beta=5.0)
    A = csr_to_dia(a, dtype=np.float64)
    X = jnp.asarray(_rhs_block(144, 5))
    Y = matvec_block(A, X)
    for j in range(5):
        np.testing.assert_allclose(
            np.asarray(Y[:, j]), np.asarray(A.matvec(X[:, j])), rtol=1e-13
        )
    # the raw block kernel too
    Y2 = dia_spmv_xla_block(A.data, A.offsets, X)
    np.testing.assert_allclose(np.asarray(Y2), np.asarray(Y), rtol=1e-13)


@pytest.mark.smoke
def test_block_pcg_matches_direct():
    a = gallery.poisson_2d(14)
    A = csr_to_dia(a, dtype=np.float64)
    n, k = 196, 4
    B = jnp.asarray(_rhs_block(n, k))
    M = JacobiPC.setup(A)
    X, st = block_pcg(A, B, M=M, tol=1e-10, maxiter=500)
    assert bool(jnp.all(st.reached_tol))
    expected = np.linalg.solve(_dense(a), np.asarray(B))
    np.testing.assert_allclose(np.asarray(X), expected, atol=1e-7)
    assert np.asarray(st.final_residual).shape == (k,)


def test_block_pcg_no_more_iterations_than_worst_column():
    """The shared block space can only help: block iterations <= the
    worst per-column PCG count (+1 slack for the stopping rule)."""
    a = gallery.poisson_2d(16)
    A = csr_to_dia(a, dtype=np.float64)
    B = jnp.asarray(_rhs_block(256, 6, seed=3))
    M = JacobiPC.setup(A)
    X, st = block_pcg(A, B, M=M, tol=1e-8, maxiter=500)
    worst = 0
    for j in range(6):
        _, s1 = pcg(A, B[:, j], M=M, tol=1e-8, maxiter=500)
        worst = max(worst, int(s1.iterations))
    assert int(st.iterations) <= worst + 1
    assert bool(jnp.all(st.reached_tol))


def test_block_pcg_rank_deficient_block():
    """Duplicate columns (rank-deficient block) must converge, not NaN."""
    a = gallery.poisson_2d(12)
    A = csr_to_dia(a, dtype=np.float64)
    b = _rhs_block(144, 1).ravel()
    B = jnp.asarray(np.stack([b, b, 2.0 * b], axis=1))  # rank 1
    X, st = block_pcg(A, B, M=JacobiPC.setup(A), tol=1e-9, maxiter=400)
    assert np.all(np.isfinite(np.asarray(X)))
    expected = np.linalg.solve(_dense(a), np.asarray(B))
    np.testing.assert_allclose(np.asarray(X), expected, atol=1e-6)


def test_block_pcg_unpreconditioned_and_x0():
    a = gallery.poisson_2d(10)
    A = csr_to_dia(a, dtype=np.float64)
    B = jnp.asarray(_rhs_block(100, 3, seed=5))
    expected = np.linalg.solve(_dense(a), np.asarray(B))
    X0 = jnp.asarray(expected + 1e-3 * _rhs_block(100, 3, seed=6))
    X, st = block_pcg(A, B, X0, tol=1e-10, maxiter=400)
    assert bool(jnp.all(st.reached_tol))
    np.testing.assert_allclose(np.asarray(X), expected, atol=1e-7)


def test_block_pcg_sharded_equivalence():
    """Same answer inside an 8-device shard_map (psum reductions)."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    a = gallery.poisson_2d(16)  # 256 = 8 * 32 rows
    A = csr_to_dia(a, dtype=np.float64)
    B = jnp.asarray(_rhs_block(256, 3, seed=9))
    X_ref, st_ref = block_pcg(A, B, tol=1e-9, maxiter=400)

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
        X, st = block_pcg(op, Bs, tol=1e-9, maxiter=400, axis_name="shards")
        return X, st.iterations

    X_sh, its = run(Ad.data, B)
    np.testing.assert_allclose(np.asarray(X_sh), np.asarray(X_ref), atol=1e-8)
    assert int(its) == int(st_ref.iterations)


def test_solve_dispatches_block_pcg():
    a = gallery.poisson_2d(12)
    from kryst_tpu.api import solve

    dense = _dense(a)
    B = np.asarray(_rhs_block(144, 3))
    X, st = solve(a, B, solver="block_pcg", pc="jacobi", tol=1e-8)
    assert X.shape == B.shape
    assert np.abs(dense @ np.asarray(X, np.float64) - B).max() < 1e-3
    # 1-D rhs degenerates to k=1
    x, st1 = solve(a, B[:, 0], solver="block_pcg", pc="jacobi", tol=1e-8)
    assert x.shape == (144,)


def test_block_pcg_interleaved_carrier_matches_cols_path():
    # the carrier layout (ops/streamed.py interleave_cols) must reproduce
    # the (k, n) path: same iteration count, solutions equal to f32
    # roundoff. CPU runs the pallas kernel in interpret mode.
    import scipy.sparse as sp

    from kryst_tpu.ops.dia import scipy_to_dia
    from kryst_tpu.pc.jacobi import JacobiPC

    rng = np.random.default_rng(4)
    n = 98304
    offs = [-12800, -128, -1, 0, 1, 128, 12800]
    vals = [-0.5, -1.0, -0.8, 6.0, -0.8, -1.0, -0.5]
    A = sp.diags([v * np.ones(n) for v in vals], offs, shape=(n, n),
                 format="csr")
    Ad = scipy_to_dia(A, dtype=np.float32).planned(block_rows=1024)
    assert Ad.plan.margin <= Ad.plan.block_rows
    k = 3
    B = rng.standard_normal((n, k)).astype(np.float32)
    M = JacobiPC.setup(Ad)
    X1, s1 = block_pcg(Ad, B, M=M, tol=1e-6, maxiter=200, inter=False)
    X2, s2 = block_pcg(Ad, B, M=M, tol=1e-6, maxiter=200, inter=True)
    assert int(s1.iterations) == int(s2.iterations)
    assert np.asarray(s2.reached_tol).all()
    scale = float(np.max(np.abs(np.asarray(X1))))
    assert float(np.max(np.abs(np.asarray(X1) - np.asarray(X2)))) <= 1e-5 * scale


def test_block_pcg_inter_rejects_nondiagonal_pc():
    import scipy.sparse as sp

    from kryst_tpu.ops.dia import scipy_to_dia
    from kryst_tpu.pc.sor import SORPC
    from kryst_tpu.matrix.csr import CSRMatrix

    a = gallery.poisson_2d(48)
    Ad = scipy_to_dia(
        sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape),
        dtype=np.float32,
    ).planned(block_rows=256)
    M = SORPC.setup(a, omega=1.0)
    B = np.ones((a.shape[0], 2), dtype=np.float32)
    with pytest.raises(ValueError):
        block_pcg(Ad, B, M=M, inter=True)


def test_block_pcg_inter_rejects_unplanned_operator():
    # inter=True on an operator with no streaming plan must raise a
    # clear ValueError, not AttributeError on plan.nblk (found driving
    # a resident-size DIAOperator on the TPU)
    A = csr_to_dia(gallery.poisson_2d(16), dtype=np.float64)
    assert A.plan is None
    B = np.ones((A.shape[0], 2), dtype=np.float64)
    with pytest.raises(ValueError, match="planned"):
        block_pcg(A, B, inter=True)


def test_solve_small_spd_indefinite_rescue():
    # the masked-Cholesky fast path NaNs on an indefinite Gram (the f32
    # 8M k=8 failure); the lax.cond eigen-rescue must kick in and return
    # the truncated pseudo-inverse solve, finite and accurate on the
    # positive eigenspace
    from kryst_tpu.solvers.block_cg import _solve_small_spd

    rng = np.random.default_rng(11)
    Q, _ = np.linalg.qr(rng.standard_normal((6, 6)))
    lam = np.array([4.0, 2.5, 1.0, 0.3, -1e-4, -2e-3])  # indefinite
    G = (Q * lam) @ Q.T
    B = rng.standard_normal((6, 3))
    eps = float(jnp.finfo(jnp.float64).eps)
    Y = np.asarray(_solve_small_spd(jnp.asarray(G), jnp.asarray(B), eps))
    assert np.all(np.isfinite(Y))
    # truncated pinv reference: negative/small eigenvalues dropped
    keep = lam > 4 * 6 * eps * lam.max()
    pinv = (Q[:, keep] / lam[keep]) @ Q[:, keep].T
    np.testing.assert_allclose(Y, pinv @ B, rtol=1e-8, atol=1e-10)


def test_solve_small_spd_spd_uses_exact_solve():
    # a well-conditioned SPD Gram must take the Cholesky path and match
    # the direct solve to machine precision (ridge is ~50*eps relative)
    from kryst_tpu.solvers.block_cg import _solve_small_spd

    rng = np.random.default_rng(12)
    W = rng.standard_normal((8, 8))
    G = W @ W.T + 8 * np.eye(8)
    B = rng.standard_normal((8, 2))
    eps = float(jnp.finfo(jnp.float64).eps)
    Y = np.asarray(_solve_small_spd(jnp.asarray(G), jnp.asarray(B), eps))
    np.testing.assert_allclose(Y, np.linalg.solve(G, B), rtol=1e-6)


def test_block_pcg_inter_rejects_axis_name():
    # advisor r4 (medium): the inter-carrier kernels compute shard-local
    # Grams with no psum — a sharded inter=True run would silently give
    # wrong alpha/beta and false convergence. Must be rejected at entry.
    from kryst_tpu.ops.dia import scipy_to_dia

    a = gallery.poisson_2d(16)
    Ad = scipy_to_dia(
        sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape),
        dtype=np.float32,
    ).planned(block_rows=256)
    B = np.ones((a.shape[0], 2), dtype=np.float32)
    with pytest.raises(ValueError, match="single-device"):
        block_pcg(Ad, B, inter=True, axis_name="shards")
