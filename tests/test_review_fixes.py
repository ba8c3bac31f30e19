"""Regression tests for the round-1 self-review findings."""
import jax.numpy as jnp
import numpy as np
import pytest

from kryst_tpu import cg, pcg
from kryst_tpu.api import PCConfig, parse_pc_options, solve
from kryst_tpu.matrix import gallery
from kryst_tpu.matrix.csr import CSRMatrix
from kryst_tpu.ops.dia import csr_to_dia


def test_sharded_default_maxiter_is_global():
    # finding: inside shard_map the solver saw only local rows, so the
    # default maxiter was n/n_shards — a tridiagonal chain needs ~n iters
    from kryst_tpu.parallel.mesh import solver_mesh
    from kryst_tpu.parallel.sharded import distribute_dia, pad_vector, sharded_solve

    mesh = solver_mesh(8)
    a = gallery.tridiag(512)
    A = csr_to_dia(a)
    Ad, n_padded = distribute_dia(A, mesh)
    b = np.random.default_rng(0).standard_normal(512)
    bd = pad_vector(jnp.asarray(b), n_padded, mesh)
    xd, sd = sharded_solve(cg, Ad, bd, mesh=mesh, tol=1e-10)  # no maxiter
    assert bool(sd.reached_tol)
    assert int(sd.iterations) > 512 // 8  # would have been capped pre-fix
    np.testing.assert_allclose(
        np.asarray(xd)[:512], np.linalg.solve(a.todense(), b), atol=1e-6
    )


def test_gmg_restrict_is_true_transpose_nonsymmetric():
    # finding: restrict used matvec (P0^T(I - wAD^-1)), which is P^T only
    # for symmetric A; now rmatvec makes <P xc, xf> == <xc, R xf> for
    # nonsymmetric operators too
    from kryst_tpu.pc.gmg import GMGPC

    a = gallery.convection_diffusion_2d(16, beta=30.0)
    pc = GMGPC.setup(a, grid=(16, 16), coarse_size=16)
    lvl = pc.levels[0]
    rng = np.random.default_rng(1)
    nc = int(np.prod(lvl.coarse))
    xc = jnp.asarray(rng.standard_normal(nc))
    xf = jnp.asarray(rng.standard_normal(256))
    lhs = float(jnp.dot(lvl.prolong(xc), xf))
    rhs = float(jnp.dot(xc, lvl.restrict(xf)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_cg_radius_single_reduction_rejected():
    A = jnp.eye(4)
    with pytest.raises(ValueError, match="trust-region"):
        cg(A, jnp.ones(4), radius=1.0, single_reduction=True)


def test_solve_rejects_pc_for_pcless_solvers():
    a = gallery.poisson_2d(6)
    for kind in ("cgs", "qmr", "tfqmr", "minres", "cgnr", "lu"):
        with pytest.raises(ValueError, match="does not accept"):
            solve(a, jnp.ones(36), solver=kind, pc="jacobi")
    # explicit pc=None / "none" still fine
    x, st = solve(a, jnp.ones(36), solver="minres", pc=None, tol=1e-8)
    assert bool(st.reached_tol)


def test_parse_pc_options_forwards_keys():
    cfg = parse_pc_options({"pc_type": "ilup", "fill": 3})
    assert dict(cfg.params)["fill"] == 3
    cfg = parse_pc_options({"pc_type": "ssor", "omega": 1.4, "its": 3})
    assert dict(cfg.params) == {"omega": 1.4, "its": 3, "eisenstat": False}
    cfg = parse_pc_options({"pc_type": "chebyshev", "degree": 20})
    assert dict(cfg.params)["degree"] == 20
    cfg = parse_pc_options({"pc_type": "ilut", "fill": 30, "drop_tol": 1e-5})
    assert dict(cfg.params) == {"fill": 30, "droptol": 1e-5}
    with pytest.raises(ValueError, match="does not accept"):
        parse_pc_options({"pc_type": "jacobi", "omega": 2.0})


def test_direct_solver_clear_error_for_matrix_free():
    from kryst_tpu.core.linop import FunctionOperator
    from kryst_tpu.solvers.direct import lu_factor

    op = FunctionOperator(mv=lambda v: v, shape=(3, 3))
    with pytest.raises(TypeError, match="materializable"):
        lu_factor(op)


def test_stencil3d_variable_coefficients():
    # finding: grid-valued coefficients crashed (broadcast error); now they
    # index at the destination row like the 2-D stencil
    from kryst_tpu.core.linop import StencilOperator3D

    rng = np.random.default_rng(2)
    g = (3, 3, 3)
    c = jnp.asarray(rng.random(g) + 6)
    lo = tuple(jnp.asarray(rng.random(g)) for _ in range(3))
    hi = tuple(jnp.asarray(rng.random(g)) for _ in range(3))
    op = StencilOperator3D(c=c, lo=lo, hi=hi, grid=g)
    x = rng.standard_normal(27)
    y = np.asarray(op.matvec(jnp.asarray(x)))

    # dense reference assembly
    import itertools

    A = np.zeros((27, 27))
    def lin(i, j, k):
        return (i * 3 + j) * 3 + k
    for i, j, k in itertools.product(range(3), repeat=3):
        row = lin(i, j, k)
        A[row, row] = np.asarray(c)[i, j, k]
        for ax, (di, dj, dk) in enumerate([(1, 0, 0), (0, 1, 0), (0, 0, 1)]):
            if (i - di, j - dj, k - dk) >= (0, 0, 0) and min(i - di, j - dj, k - dk) >= 0:
                A[row, lin(i - di, j - dj, k - dk)] = np.asarray(lo[ax])[i, j, k]
            if i + di < 3 and j + dj < 3 and k + dk < 3:
                A[row, lin(i + di, j + dj, k + dk)] = np.asarray(hi[ax])[i, j, k]
    np.testing.assert_allclose(y, A @ x, rtol=1e-6)
    yt = np.asarray(op.rmatvec(jnp.asarray(x)))
    np.testing.assert_allclose(yt, A.T @ x, rtol=1e-6)


def test_bicgstab_breakdown_returns_finite_iterate():
    # finding: on scalar breakdown the corrupted update was returned;
    # now the last good iterate is frozen. Construct a breakdown: rhat
    # orthogonal to r after one step on a rotation-like matrix.
    from kryst_tpu.solvers.bicgstab import bicgstab

    A = jnp.array([[0.0, 1.0], [-1.0, 0.0]])  # rotation: BiCG-family poison
    b = jnp.array([1.0, 0.0])
    x, st = bicgstab(A, b, tol=1e-12, maxiter=10)
    assert np.isfinite(np.asarray(x)).all()
    # frozen iterate: residual of returned x must not be worse than ||b||
    r = np.asarray(b - A @ x)
    assert np.linalg.norm(r) <= np.linalg.norm(np.asarray(b)) * (1 + 1e-6)


def test_f32_true_residual_honesty():
    # VERDICT r1 weak #3: in f32 the recursive residual can cross tol while
    # the TRUE residual is orders of magnitude above it. With the default
    # (auto-on below f64) final true-residual recompute, reached_tol and
    # final_residual must reflect the truth.
    from kryst_tpu import JacobiPC, pcg
    from kryst_tpu.matrix import gallery

    A = gallery.poisson_2d_stencil(128, dtype=jnp.float32)
    b = jnp.ones(128 * 128, dtype=jnp.float32)
    M = JacobiPC.setup(A)

    # dishonest mode (explicit opt-out): recursive residual claims the tol
    x0_, s_off = pcg(A, b, M=M, tol=1e-6, maxiter=2000, true_residual=False)
    # honest default
    x1_, s_on = pcg(A, b, M=M, tol=1e-6, maxiter=2000)
    r = np.asarray(b - A.matvec(x1_))
    true_rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(b))
    np.testing.assert_allclose(
        float(s_on.rel_residual), true_rel, rtol=1e-3
    )
    if true_rel > 1e-6:  # the f32 floor scenario this test targets
        assert not bool(s_on.reached_tol)
        assert bool(s_off.reached_tol)  # the old lie, now opt-in only

    # f64 keeps the zero-extra-matvec path and stays consistent
    a = gallery.poisson_2d(24)
    Ad = a.to_ell()
    b64 = jnp.ones(576)
    x, st = pcg(Ad, b64, M=JacobiPC.setup(Ad), tol=1e-10, maxiter=800)
    assert bool(st.reached_tol)
    r64 = np.ones(576) - np.asarray(a.todense()) @ np.asarray(x)
    assert np.linalg.norm(r64) / np.sqrt(576) <= 1e-9
