"""Preconditioner suite tests: the PC x solver compatibility matrix plus
per-PC unit tests (reference tests/preconditioner_integration.rs,
tests/preconditioner_sor.rs, and the inline PC tests)."""
import jax.numpy as jnp
import numpy as np
import pytest

from kryst_tpu import JacobiPC, cg, pcg
from kryst_tpu.matrix import gallery
from kryst_tpu.matrix.csr import CSRMatrix
from kryst_tpu.pc import coloring
from kryst_tpu.pc.asm import AdditiveSchwarzPC
from kryst_tpu.pc.block_jacobi import BlockJacobiPC
from kryst_tpu.pc.chebyshev import ChebyshevPC, chebyshev_t, estimate_spectrum
from kryst_tpu.pc.ilu import ilu0, ilup, ilut
from kryst_tpu.pc.sor import SORPC, SweepType, gauss_seidel, ssor
from kryst_tpu.pc.spai import spai_setup
from kryst_tpu.pc.triangular import lower_factor_from_csr, upper_factor_from_csr
from kryst_tpu.solvers.gmres import gmres


# ------------------------------------------------------------- triangular
def test_triangular_lower_solve():
    rng = np.random.default_rng(0)
    L = np.tril(rng.standard_normal((12, 12)), -1) + np.diag(2 + rng.random(12))
    b = rng.standard_normal(12)
    f = lower_factor_from_csr(CSRMatrix.from_dense(L), unit_diag=False)
    x = f.solve(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(L, b), atol=1e-10)


def test_triangular_upper_solve():
    rng = np.random.default_rng(1)
    U = np.triu(rng.standard_normal((12, 12)), 1) + np.diag(2 + rng.random(12))
    b = rng.standard_normal(12)
    f = upper_factor_from_csr(CSRMatrix.from_dense(U), unit_diag=False)
    x = f.solve(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(U, b), atol=1e-10)


def test_triangular_unit_diag():
    rng = np.random.default_rng(2)
    L = np.tril(rng.standard_normal((10, 10)), -1) + np.eye(10)
    b = rng.standard_normal(10)
    f = lower_factor_from_csr(CSRMatrix.from_dense(L), unit_diag=True)
    np.testing.assert_allclose(
        np.asarray(f.solve(jnp.asarray(b))), np.linalg.solve(L, b), atol=1e-10
    )


# ------------------------------------------------------------- coloring
def test_coloring_poisson_valid():
    a = gallery.poisson_2d(6)
    colors = coloring.color_graph(a, distance=1)
    # adjacent nodes differ in color
    for i in range(a.shape[0]):
        cols, _ = a.row(i)
        for j in cols[cols != i]:
            assert colors[i] != colors[j]
    # 5-point Poisson is 2-colorable (red-black)
    assert colors.max() + 1 == 2


def test_distance2_coloring_valid():
    a = gallery.poisson_2d(5)
    colors = coloring.color_graph(a, distance=2)
    adj = coloring.extract_adjacency(a)
    for i in range(a.shape[0]):
        for j in coloring.distance2_neighbors(adj, i):
            assert colors[i] != colors[j]
    blocks = coloring.build_blocks_from_colors(colors)
    assert sum(len(b) for b in blocks) == a.shape[0]


# ------------------------------------------------------------- ILU family
def test_ilu0_exact_on_tridiag():
    # tridiagonal: ILU(0) == exact LU -> PC solve is exact
    a = gallery.tridiag(20)
    pc = ilu0(a)
    b = np.random.default_rng(3).standard_normal(20)
    z = pc.apply(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(z), np.linalg.solve(a.todense(), b), atol=1e-10)


def test_ilu0_pcg_poisson_iterations():
    # PCG+ILU0 must converge much faster than plain CG
    a = gallery.poisson_2d(16)
    A = a.to_ell()
    b = jnp.ones(256)
    x0, s0 = cg(A, b, tol=1e-10, maxiter=1000)
    x1, s1 = pcg(A, b, M=ilu0(a), tol=1e-10, maxiter=1000)
    assert bool(s1.reached_tol)
    assert int(s1.iterations) < int(s0.iterations)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x1), atol=1e-7)


def test_ilu0_gmres_convection_diffusion():
    # BASELINE config 2 shape: GMRES+ILU(0) on nonsymmetric conv-diff
    a = gallery.convection_diffusion_2d(16)
    A = a.to_ell()
    b = jnp.ones(256)
    x, stats = gmres(A, b, M=ilu0(a), side="left", tol=1e-10, maxiter=300, restart=30)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a.todense(), np.ones(256)), atol=1e-6
    )
    assert int(stats.iterations) < 60


def test_ilup_more_fill_fewer_iterations():
    a = gallery.poisson_2d(16)
    A = a.to_ell()
    b = jnp.ones(256)
    _, s0 = pcg(A, b, M=ilup(a, fill=0), tol=1e-10, maxiter=500)
    _, s2 = pcg(A, b, M=ilup(a, fill=2), tol=1e-10, maxiter=500)
    assert int(s2.iterations) <= int(s0.iterations)
    assert bool(s2.reached_tol)


def test_ilup_fill0_matches_ilu0():
    a = gallery.poisson_2d(10)
    b = np.random.default_rng(4).standard_normal(100)
    z0 = ilu0(a).apply(jnp.asarray(b))
    z1 = ilup(a, fill=0).apply(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1), atol=1e-12)


def test_ilut_real_elimination_beats_reference_mode():
    a = gallery.poisson_2d(16)
    A = a.to_ell()
    b = jnp.ones(256)
    _, s_real = pcg(A, b, M=ilut(a, fill=8, droptol=1e-3), tol=1e-10, maxiter=500)
    _, s_ref = pcg(A, b, M=ilut(a, fill=8, droptol=1e-3, eliminate=False), tol=1e-10, maxiter=500)
    assert bool(s_real.reached_tol)
    # real ILUT should not be worse than the reference's sparsify-only mode
    assert int(s_real.iterations) <= int(s_ref.iterations)


# ------------------------------------------------------------- SOR family
def test_sor_identity_passthrough():
    # SOR on the identity: z == r (preconditioner_sor.rs:43-60)
    a = CSRMatrix.from_dense(np.eye(8))
    pc = SORPC.setup(a, omega=1.0, its=1, sweep=SweepType.FORWARD)
    r = np.random.default_rng(5).standard_normal(8)
    np.testing.assert_allclose(np.asarray(pc.apply(jnp.asarray(r))), r, atol=1e-12)


def test_sor_forward_sweep_matches_manual():
    # forward sweep vs a manually computed sequential sweep
    # (preconditioner_sor.rs:61-85)
    a = gallery.tridiag(10)
    dense = a.todense()
    omega = 1.3
    pc = SORPC.setup(a, omega=omega, its=1, sweep=SweepType.FORWARD)
    r = np.random.default_rng(6).standard_normal(10)
    z = np.zeros(10)
    for i in range(10):  # sequential reference sweep
        s = dense[i] @ z - dense[i, i] * z[i]
        z[i] = (1 - omega) * z[i] + omega / dense[i, i] * (r[i] - s)
    np.testing.assert_allclose(np.asarray(pc.apply(jnp.asarray(r))), z, atol=1e-10)


def test_ssor_finite_and_spd_preserving():
    # SSOR apply finite (preconditioner_sor.rs:86-100) and symmetric PC
    # keeps PCG convergent
    a = gallery.poisson_2d(12)
    pc = ssor(a, omega=1.2)
    r = np.random.default_rng(7).standard_normal(144)
    z = pc.apply(jnp.asarray(r))
    assert np.isfinite(np.asarray(z)).all()
    A = a.to_ell()
    b = jnp.ones(144)
    x, stats = pcg(A, b, M=pc, tol=1e-10, maxiter=300)
    assert bool(stats.reached_tol)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a.todense(), np.ones(144)), atol=1e-6
    )


def test_sor_multiple_iterations_improve():
    a = gallery.poisson_2d(10)
    dense = a.todense()
    r = np.ones(100)
    exact = np.linalg.solve(dense, r)
    z1 = np.asarray(gauss_seidel(a, its=1).apply(jnp.asarray(r)))
    z5 = np.asarray(gauss_seidel(a, its=5).apply(jnp.asarray(r)))
    assert np.linalg.norm(z5 - exact) < np.linalg.norm(z1 - exact)


def test_multicolor_sor_redblack_equivalence():
    # on a 5-point stencil: 2 colors; one sweep must equal a hand-rolled
    # red-black Gauss-Seidel update
    from kryst_tpu.pc.sor import MulticolorSORPC
    from kryst_tpu.pc.coloring import color_graph

    a = gallery.poisson_2d(8)
    dense = a.todense()
    colors = color_graph(a, distance=1)
    pc = MulticolorSORPC.setup(a, omega=1.0, its=1, symmetric=False)
    assert pc.color_masks.shape[0] == 2
    r = np.random.default_rng(11).standard_normal(64)
    z = np.zeros(64)
    d = np.diag(dense)
    for c in (0, 1):  # red then black, each using latest values
        rows = colors == c
        z[rows] = z[rows] + (r[rows] - dense[rows] @ z) / d[rows]
    np.testing.assert_allclose(np.asarray(pc.apply(jnp.asarray(r))), z, atol=1e-12)


def test_multicolor_ssor_pcg():
    from kryst_tpu.pc.sor import MulticolorSORPC

    a = gallery.poisson_2d(16)
    from kryst_tpu.ops.dia import csr_to_dia

    A = csr_to_dia(a)
    b = jnp.ones(256)
    pc = MulticolorSORPC.setup(a, omega=1.2, its=1, symmetric=True)
    x, s = pcg(A, b, M=pc, tol=1e-9, maxiter=300)
    assert bool(s.reached_tol)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a.todense(), np.ones(256)), atol=1e-6
    )


def test_sor_zero_pivot_raises():
    a = CSRMatrix.from_dense(np.diag([1.0, 0.0, 2.0]))
    with pytest.raises(ZeroDivisionError):
        SORPC.setup(a)


def test_sor_repr():
    pc = SORPC.setup(gallery.tridiag(5), omega=1.1, its=2)
    assert "omega=1.1" in repr(pc)


# ------------------------------------------------------------- Chebyshev
def test_chebyshev_t_recurrence():
    # T_m values (chebyshev.rs:143-159)
    x = jnp.asarray(0.3)
    np.testing.assert_allclose(float(chebyshev_t(0, x)), 1.0)
    np.testing.assert_allclose(float(chebyshev_t(1, x)), 0.3)
    np.testing.assert_allclose(
        float(chebyshev_t(4, x)), float(8 * 0.3**4 - 8 * 0.3**2 + 1), rtol=1e-12
    )


def test_chebyshev_spectrum_estimate():
    a = gallery.poisson_2d(10)
    lam = float(estimate_spectrum(a.to_ell(), iters=50))
    eigs = np.linalg.eigvalsh(a.todense())
    assert 0.9 * eigs[-1] <= lam <= 1.01 * eigs[-1]


def test_chebyshev_pc_accelerates_cg():
    a = gallery.poisson_2d(16)
    A = a.to_ell()
    b = jnp.ones(256)
    eigs = np.linalg.eigvalsh(a.todense())
    pc = ChebyshevPC.setup(A, degree=8, emin=float(eigs[0]), emax=float(eigs[-1]))
    _, s_plain = cg(A, b, tol=1e-10, maxiter=500)
    x, s_cheb = pcg(A, b, M=pc, tol=1e-10, maxiter=500)
    assert bool(s_cheb.reached_tol)
    assert int(s_cheb.iterations) < int(s_plain.iterations)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a.todense(), np.ones(256)), atol=1e-6
    )


# ------------------------------------------------------------- BlockJacobi
def test_block_jacobi_exact_when_blocks_cover():
    # one block == full LU -> exact inverse
    a = gallery.poisson_2d(6)
    pc = BlockJacobiPC.setup(a, nblocks=1)
    b = np.random.default_rng(8).standard_normal(36)
    np.testing.assert_allclose(
        np.asarray(pc.apply(jnp.asarray(b))),
        np.linalg.solve(a.todense(), b),
        atol=1e-10,
    )


def test_block_jacobi_accelerates_pcg():
    a = gallery.poisson_2d(16)
    A = a.to_ell()
    b = jnp.ones(256)
    pc = BlockJacobiPC.setup(a, nblocks=4)  # 4 blocks of 64 rows
    _, s_j = pcg(A, b, M=JacobiPC.setup(A), tol=1e-10, maxiter=500)
    x, s_bj = pcg(A, b, M=pc, tol=1e-10, maxiter=500)
    assert bool(s_bj.reached_tol)
    assert int(s_bj.iterations) < int(s_j.iterations)


def test_block_jacobi_from_colors():
    a = gallery.poisson_2d(8)
    colors = coloring.color_graph(a, distance=2)
    blocks = coloring.build_blocks_from_colors(colors)
    pc = BlockJacobiPC.setup(a, blocks=blocks)
    z = pc.apply(jnp.ones(64))
    assert np.isfinite(np.asarray(z)).all()


# ------------------------------------------------------------- ASM
def test_asm_identity_with_lu_blocks():
    # ASM on identity: block solves of I return r (asm.rs:124-136)
    a = CSRMatrix.from_dense(np.eye(12))
    pc = AdditiveSchwarzPC.setup(a, nblocks=3, overlap=0)
    r = np.random.default_rng(9).standard_normal(12)
    np.testing.assert_allclose(np.asarray(pc.apply(jnp.asarray(r))), r, atol=1e-12)


def test_asm_overlap_grows_subdomains():
    a = gallery.poisson_2d(8)
    s0 = AdditiveSchwarzPC.setup(a, nblocks=4, overlap=0)
    s1 = AdditiveSchwarzPC.setup(a, nblocks=4, overlap=1)
    # overlap=1 blocks are strictly larger
    assert s1.idx.shape[1] > s0.idx.shape[1]


def test_asm_accelerates_pcg():
    a = gallery.poisson_2d(16)
    A = a.to_ell()
    b = jnp.ones(256)
    pc = AdditiveSchwarzPC.setup(a, nblocks=8, overlap=1)
    x, s = pcg(A, b, M=pc, tol=1e-8, maxiter=500)
    _, s_plain = cg(A, b, tol=1e-8, maxiter=500)
    assert bool(s.reached_tol)
    assert int(s.iterations) < int(s_plain.iterations)


def test_asm_weighted_variant_with_gmres():
    # the partition-of-unity weighting yields a NONSYMMETRIC M — fine for
    # GMRES, wrong for PCG
    a = gallery.poisson_2d(12)
    A = a.to_ell()
    b = jnp.ones(144)
    pc = AdditiveSchwarzPC.setup(a, nblocks=4, overlap=1, weighted=True)
    x, s = gmres(A, b, M=pc, side="right", tol=1e-8, maxiter=300, restart=30)
    assert bool(s.reached_tol)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a.todense(), np.ones(144)), atol=1e-5
    )


# ------------------------------------------------------------- SPAI
def test_spai_exact_inverse_recovery_diagonal():
    # SPAI on a diagonal matrix recovers the exact inverse
    # (approxinv.rs:382-396)
    d = np.array([2.0, 4.0, 5.0, 8.0])
    a = CSRMatrix.from_dense(np.diag(d))
    pc = spai_setup(a)
    r = np.ones(4)
    np.testing.assert_allclose(np.asarray(pc.apply(jnp.asarray(r))), 1.0 / d, atol=1e-10)


def test_spai_poisson_acceleration():
    # SPAI's one-sided least-squares M is not symmetric, so the natural
    # pairing is GMRES (as in the reference, which uses it generically)
    a = gallery.poisson_2d(12)
    A = a.to_ell()
    b = jnp.ones(144)
    pc = spai_setup(a)
    x, s = gmres(A, b, M=pc, side="right", tol=1e-8, maxiter=300, restart=30)
    _, s_plain = gmres(A, b, tol=1e-8, maxiter=300, restart=30)
    assert bool(s.reached_tol)
    assert int(s.iterations) < int(s_plain.iterations)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a.todense(), np.ones(144)), atol=1e-5
    )


def test_eisenstat_cg_matches_ssor_pcg():
    # Eisenstat's trick (sor.rs:42, unimplemented there): CG on the
    # transformed system must converge like SSOR-PCG and give the same x
    from kryst_tpu import pcg
    from kryst_tpu.pc.sor import eisenstat_cg, ssor

    a = gallery.poisson_2d(24)
    n = a.shape[0]
    b = jnp.ones(n)
    expected = np.linalg.solve(np.asarray(a.todense()), np.ones(n))
    for omega in (1.0, 1.4):
        M = ssor(a, omega=omega, its=1)
        x1, s1 = pcg(a.to_ell(), b, M=M, tol=1e-10, maxiter=500)
        x2, s2 = eisenstat_cg(a, b, omega=omega, tol=1e-10, maxiter=500)
        assert bool(s2.reached_tol)
        np.testing.assert_allclose(np.asarray(x2), expected, atol=1e-7)
        assert abs(int(s1.iterations) - int(s2.iterations)) <= 3, (
            omega, int(s1.iterations), int(s2.iterations)
        )


def test_eisenstat_operator_identity():
    # the matvec-free A-hat equals the explicitly assembled
    # S (Dh+L)^-1 A (Dh+U)^-1 S
    from kryst_tpu.pc.sor import EisenstatSSOR

    a = gallery.convection_diffusion_2d(6)  # positive diagonal, nonsymmetric
    n = a.shape[0]
    Ad = np.asarray(a.todense(), dtype=np.float64)
    omega = 1.2
    d = np.diag(Ad)
    dh = d / omega
    L = np.tril(Ad, -1) + np.diag(dh)
    U = np.triu(Ad, 1) + np.diag(dh)
    S = np.diag(np.sqrt(dh))
    Ahat = S @ np.linalg.solve(L, Ad @ np.linalg.solve(U, S))
    E = EisenstatSSOR.setup(a, omega=omega)
    rng = np.random.default_rng(3)
    v = rng.standard_normal(n)
    np.testing.assert_allclose(np.asarray(E.matvec(jnp.asarray(v))), Ahat @ v, rtol=1e-10)


def test_eisenstat_rejects_nonpositive_diagonal():
    import pytest as _pytest

    from kryst_tpu.matrix.csr import CSRMatrix
    from kryst_tpu.pc.sor import EisenstatSSOR

    A = np.array([[0.0, 1.0], [1.0, 2.0]])
    with _pytest.raises(ValueError, match="positive diagonal"):
        EisenstatSSOR.setup(CSRMatrix.from_dense(A))


def test_sor_zero_initial_guess_flag_equivalence():
    # ZERO_INITIAL_GUESS skips provably-zero work; the apply is identical
    from kryst_tpu.pc.sor import SORPC, SweepType

    a = gallery.convection_diffusion_2d(8)
    r = jnp.asarray(np.random.default_rng(1).standard_normal(64))
    for base in (SweepType.SYMMETRIC, SweepType.FORWARD, SweepType.BACKWARD):
        plain = SORPC.setup(a, omega=1.3, its=2, sweep=base)
        fast = SORPC.setup(
            a, omega=1.3, its=2, sweep=base | SweepType.ZERO_INITIAL_GUESS
        )
        np.testing.assert_allclose(
            np.asarray(plain.apply(r)), np.asarray(fast.apply(r)), rtol=1e-12
        )


def test_sor_eisenstat_flag_points_to_driver():
    import pytest as _pytest

    from kryst_tpu.pc.sor import SORPC, SweepType

    a = gallery.poisson_2d(4)
    with _pytest.raises(ValueError, match="eisenstat_cg"):
        SORPC.setup(a, sweep=SweepType.SYMMETRIC | SweepType.EISENSTAT)
