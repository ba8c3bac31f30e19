"""DIA operator and geometric multigrid tests."""
import jax.numpy as jnp
import numpy as np

from kryst_tpu import cg, pcg
from kryst_tpu.matrix import gallery
from kryst_tpu.matrix.csr import CSRMatrix
from kryst_tpu.ops.dia import DIAOperator, csr_to_dia, dia_spmv_xla
from kryst_tpu.pc.gmg import GMGPC, _downsample_sum, _upsample


def test_poisson_3d_dia_direct_builder():
    # O(n) direct DIA assembly must equal the CSR->DIA path exactly
    A1 = gallery.poisson_3d_dia(6, dtype=np.float64)
    A2 = csr_to_dia(gallery.poisson_3d(6))
    assert A1.offsets == A2.offsets
    x = jnp.asarray(np.random.default_rng(0).standard_normal(216))
    np.testing.assert_allclose(
        np.asarray(A1.matvec(x)), np.asarray(A2.matvec(x)), rtol=1e-14
    )


def test_dia_matvec_matches_csr():
    a = gallery.poisson_3d(6)
    A = csr_to_dia(a)
    x = np.random.default_rng(0).standard_normal(216)
    np.testing.assert_allclose(
        np.asarray(A.matvec(jnp.asarray(x))), a.spmv(x), rtol=1e-12
    )


def test_dia_rmatvec_nonsymmetric():
    a = gallery.convection_diffusion_2d(8)
    A = csr_to_dia(a)
    x = np.random.default_rng(1).standard_normal(64)
    np.testing.assert_allclose(
        np.asarray(A.rmatvec(jnp.asarray(x))), a.transpose().spmv(x), rtol=1e-10
    )


def test_dia_diagonal_and_dense():
    a = gallery.tridiag(10)
    A = csr_to_dia(a)
    np.testing.assert_allclose(np.asarray(A.diagonal()), np.full(10, 2.0))
    np.testing.assert_allclose(np.asarray(A.todense()), a.todense())


def test_dia_cg_solve():
    a = gallery.poisson_2d(16)
    A = csr_to_dia(a)
    b = jnp.ones(256)
    x, s = cg(A, b, tol=1e-10, maxiter=500)
    assert bool(s.reached_tol)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a.todense(), np.ones(256)), atol=1e-6
    )


def test_upsample_downsample_adjoint():
    # <P0 xc, xf> == <xc, P0^T xf>
    rng = np.random.default_rng(2)
    fine, coarse = (7, 6), (4, 3)
    xc = jnp.asarray(rng.standard_normal(12))
    xf = jnp.asarray(rng.standard_normal(42))
    lhs = float(jnp.dot(_upsample(xc, coarse, fine), xf))
    rhs = float(jnp.dot(xc, _downsample_sum(xf, coarse, fine)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_gmg_transfer_matches_host_P():
    # device prolong/restrict must equal the host P / P^T used for RAP
    import scipy.sparse as sp

    a = gallery.poisson_2d(9)
    pc = GMGPC.setup(a, grid=(9, 9), coarse_size=4)
    lvl = pc.levels[0]
    n = 81
    nc = int(np.prod(lvl.coarse))
    A = sp.csr_matrix((a.data.astype(np.float64), a.indices, a.indptr), shape=a.shape)
    idx = np.indices(lvl.fine)
    agg = np.ravel_multi_index([ix.reshape(-1) // 2 for ix in idx], lvl.coarse)
    P0 = sp.csr_matrix((np.ones(n), (np.arange(n), agg)), shape=(n, nc))
    d = np.asarray(A.diagonal())
    P = (P0 - lvl.p_omega * (sp.diags(1.0 / d) @ (A @ P0))).tocsr()
    rng = np.random.default_rng(3)
    xc = rng.standard_normal(nc)
    np.testing.assert_allclose(
        np.asarray(lvl.prolong(jnp.asarray(xc))), P @ xc, atol=1e-10
    )
    xf = rng.standard_normal(n)
    np.testing.assert_allclose(
        np.asarray(lvl.restrict(jnp.asarray(xf))), P.T @ xf, atol=1e-10
    )


def test_gmg_pcg_2d():
    a = gallery.poisson_2d(32)
    A = csr_to_dia(a)
    b = jnp.ones(1024)
    pc = GMGPC.setup(a, grid=(32, 32))
    x, s = pcg(A, b, M=pc, tol=1e-10, maxiter=100)
    assert bool(s.reached_tol)
    assert int(s.iterations) <= 20
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a.todense(), np.ones(1024)), atol=1e-6
    )


def test_gmg_pcg_3d():
    a = gallery.poisson_3d(12)
    A = csr_to_dia(a)
    b = jnp.ones(12**3)
    pc = GMGPC.setup(a, grid=(12, 12, 12), nu_pre=2, nu_post=2)
    x, s = pcg(A, b, M=pc, tol=1e-9, maxiter=100)
    assert bool(s.reached_tol)
    assert int(s.iterations) <= 15
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a.todense(), np.ones(12**3)), atol=1e-6
    )


def test_gmg_iteration_count_grid_independent():
    its = []
    for nx in (16, 32, 48):
        a = gallery.poisson_2d(nx)
        A = csr_to_dia(a)
        b = jnp.ones(nx * nx)
        pc = GMGPC.setup(a, grid=(nx, nx), nu_pre=2, nu_post=2, coarse_size=16)
        _, s = pcg(A, b, M=pc, tol=1e-8, maxiter=100)
        assert bool(s.reached_tol)
        its.append(int(s.iterations))
    # multigrid: h-independent iteration counts (within slack)
    assert max(its) - min(its) <= 3, its


def test_gmg_convection_diffusion():
    # nonsymmetric stencil problem through the same machinery (GMRES)
    from kryst_tpu.solvers.gmres import gmres

    a = gallery.convection_diffusion_2d(24)
    A = csr_to_dia(a)
    b = jnp.ones(576)
    pc = GMGPC.setup(a, grid=(24, 24))
    x, s = gmres(A, b, M=pc, side="right", tol=1e-9, maxiter=100, restart=20)
    assert bool(s.reached_tol)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a.todense(), np.ones(576)), atol=1e-5
    )


def test_chebyshev_smoother_polynomial_identity():
    """The varying-omega sweep realizes EXACTLY the scaled-Chebyshev
    error polynomial (product over the shifted roots)."""
    import math

    from kryst_tpu.pc.gmg import chebyshev_omegas

    ub, nu, alpha = 2.0, 3, 4.0
    oms = chebyshev_omegas(ub, nu, alpha)
    lb = ub / alpha
    theta, delta = 0.5 * (ub + lb), 0.5 * (ub - lb)
    t = np.linspace(0.0, ub, 17)
    e = np.ones_like(t)
    for om in oms:
        e *= 1.0 - om * t
    # reference polynomial T_nu((theta - t)/delta)/T_nu(theta/delta)
    def T(k, x):
        x = np.asarray(x, dtype=complex)
        return np.cosh(k * np.arccosh(x)).real

    p = T(nu, (theta - t) / delta) / T(nu, theta / delta)
    np.testing.assert_allclose(e, p, atol=1e-12)
    # equioscillation bound on the smoothing interval
    ts = np.linspace(lb, ub, 400)
    es = np.ones_like(ts)
    for om in oms:
        es *= 1.0 - om * ts
    assert np.max(np.abs(es)) <= 1.0 / T(nu, theta / delta) + 1e-12


def test_gmg_chebyshev_smoother_converges_and_is_spd():
    from kryst_tpu.solvers.cg import pcg

    a = gallery.poisson_3d(24)
    A = a.to_device_operator(dtype=jnp.float64)
    b = jnp.ones(24 ** 3, jnp.float64)
    pc_j = GMGPC.setup(a, grid=(24,) * 3, nu_pre=2, nu_post=2,
                       dtype=np.float64)
    pc_c = GMGPC.setup(a, grid=(24,) * 3, nu_pre=2, nu_post=2,
                       dtype=np.float64, smoother="chebyshev")
    xj, sj = pcg(A, b, M=pc_j, tol=1e-8, maxiter=60)
    xc, sc = pcg(A, b, M=pc_c, tol=1e-8, maxiter=60)
    assert bool(sj.reached_tol) and bool(sc.reached_tol)
    assert int(sc.iterations) <= int(sj.iterations)  # never worse here
    # self-adjointness of the V-cycle (nu_pre == nu_post, reversed post
    # schedule): <M r1, r2> == <r1, M r2>
    rng = np.random.default_rng(0)
    r1 = jnp.asarray(rng.standard_normal(24 ** 3))
    r2 = jnp.asarray(rng.standard_normal(24 ** 3))
    s1 = float(jnp.vdot(pc_c.apply(r1), r2))
    s2 = float(jnp.vdot(r1, pc_c.apply(r2)))
    assert abs(s1 - s2) <= 1e-10 * max(abs(s1), 1.0)


def test_gmg_symmetric_assertion_matches_detection():
    # symmetric=True must produce the same hierarchy as auto-detection
    # (Poisson is symmetric); compare level data bitwise + V-cycle output
    a = gallery.poisson_3d(12)
    auto = GMGPC.setup(a, grid=(12,) * 3, dtype=np.float32)
    asserted = GMGPC.setup(a, grid=(12,) * 3, dtype=np.float32,
                           symmetric=True)
    assert len(auto.levels) == len(asserted.levels)
    for la, lb in zip(auto.levels, asserted.levels):
        assert la.A.offsets == lb.A.offsets
        assert np.array_equal(np.asarray(la.A.data), np.asarray(lb.A.data))
    r = jnp.asarray(
        np.random.default_rng(0).standard_normal(12 ** 3).astype(np.float32)
    )
    assert np.array_equal(np.asarray(auto.apply(r)),
                          np.asarray(asserted.apply(r)))


def test_csr_to_dia_blk_dtype_threading():
    # an explicit blk_dtype reaches the streamed panel without a device
    # round-trip; matvec values match the f32-panel operator within bf16
    # rounding of the coefficients
    import scipy.sparse as sp

    rng = np.random.default_rng(5)
    n = 4096
    offs = [-256, -16, -3, -1, 0, 1, 3, 16, 256, 512]
    A = sp.diags([rng.standard_normal(n) for _ in offs], offs,
                 shape=(n, n), format="csr")
    from kryst_tpu.ops.dia import scipy_to_dia

    d32 = scipy_to_dia(A, dtype=np.float32)
    dbf = scipy_to_dia(A, dtype=np.float32, blk_dtype=jnp.bfloat16)
    assert d32.data_blk is not None and dbf.data_blk is not None
    assert str(dbf.data_blk.dtype) == "bfloat16"
    # data (the resident-path panel) stays f32 in both
    assert d32.data.dtype == dbf.data.dtype
