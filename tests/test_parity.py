"""Iteration-parity harness vs the NumPy oracle (stand-in for the Rust
reference, which cannot be built in this environment — see
kryst_tpu/oracle/np_ref.py). BASELINE budget: +-2 iterations at rtol 1e-8
(SURVEY §4, BASELINE.md)."""
import jax.numpy as jnp
import numpy as np

from kryst_tpu import JacobiPC, cg, pcg
from kryst_tpu.matrix import gallery
from kryst_tpu.oracle import np_ref
from kryst_tpu.solvers.bicgstab import bicgstab
from kryst_tpu.solvers.gmres import gmres
from kryst_tpu.solvers.minres import minres

RTOL = 1e-8
BUDGET = 2


def test_parity_cg_poisson_config1():
    # BASELINE config 1: CG + (trivial) Jacobi on 2-D Poisson 5-point.
    # NB at 128^2 the dense oracle matmul is heavy; 64^2 preserves the
    # iteration structure while keeping the oracle fast.
    a = gallery.poisson_2d(64)
    dense = a.todense()
    b = np.ones(64 * 64)
    x_ref, it_ref, hist = np_ref.np_cg(dense, b, tol=RTOL, maxiter=2000)
    x, st = cg(a.to_ell(), jnp.asarray(b), tol=RTOL, maxiter=2000)
    assert abs(int(st.iterations) - it_ref) <= BUDGET, (int(st.iterations), it_ref)
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-6)


def test_parity_pcg_jacobi():
    a = gallery.poisson_2d(48)
    dense = a.todense()
    b = np.random.default_rng(0).standard_normal(48 * 48)
    d = np.diag(dense)
    x_ref, it_ref, _ = np_ref.np_pcg(dense, b, lambda r: r / d, tol=RTOL, maxiter=2000)
    A = a.to_ell()
    x, st = pcg(A, jnp.asarray(b), M=JacobiPC.setup(A), tol=RTOL, maxiter=2000)
    assert abs(int(st.iterations) - it_ref) <= BUDGET, (int(st.iterations), it_ref)


def test_parity_gmres_convection_diffusion_config2():
    # BASELINE config 2 structure: GMRES(30) on nonsymmetric conv-diff
    a = gallery.convection_diffusion_2d(24)
    dense = a.todense()
    b = np.ones(576)
    x_ref, it_ref, _ = np_ref.np_gmres(dense, b, tol=RTOL, maxiter=600, restart=30)
    x, st = gmres(a.to_ell(), jnp.asarray(b), tol=RTOL, maxiter=600, restart=30)
    assert abs(int(st.iterations) - it_ref) <= BUDGET, (int(st.iterations), it_ref)
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-5)


def test_parity_gmres_left_preconditioned():
    a = gallery.convection_diffusion_2d(16)
    dense = a.todense()
    b = np.ones(256)
    d = np.diag(dense)
    x_ref, it_ref, _ = np_ref.np_gmres(
        dense, b, tol=RTOL, maxiter=400, restart=20, Minv=lambda v: v / d, side="left"
    )
    A = a.to_ell()
    x, st = gmres(
        A, jnp.asarray(b), M=JacobiPC.setup(A), side="left", tol=RTOL,
        maxiter=400, restart=20,
    )
    assert abs(int(st.iterations) - it_ref) <= BUDGET, (int(st.iterations), it_ref)


def test_parity_bicgstab():
    a = gallery.convection_diffusion_2d(16)
    dense = a.todense()
    b = np.ones(256)
    x_ref, it_ref, _ = np_ref.np_bicgstab(dense, b, tol=RTOL, maxiter=800)
    x, st = bicgstab(a.to_ell(), jnp.asarray(b), tol=RTOL, maxiter=800)
    assert abs(int(st.iterations) - it_ref) <= BUDGET, (int(st.iterations), it_ref)


def test_parity_minres():
    a = gallery.poisson_2d(32)
    dense = a.todense()
    b = np.ones(1024)
    x_ref, it_ref, _ = np_ref.np_minres(dense, b, tol=RTOL, maxiter=800)
    x, st = minres(a.to_ell(), jnp.asarray(b), tol=RTOL, maxiter=800)
    assert abs(int(st.iterations) - it_ref) <= BUDGET, (int(st.iterations), it_ref)


def test_parity_cgs():
    a = gallery.tridiag(64, diag=4.0)
    dense = a.todense()
    b = np.ones(64)
    from kryst_tpu.solvers.cgs import cgs as jcgs

    x_ref, it_ref, _ = np_ref.np_cgs(dense, b, tol=RTOL, maxiter=400)
    x, st = jcgs(a.to_ell(), jnp.asarray(b), tol=RTOL, maxiter=400)
    assert abs(int(st.iterations) - it_ref) <= BUDGET, (int(st.iterations), it_ref)


def test_parity_cgnr():
    from kryst_tpu.solvers.cgnr import cgnr as jcgnr

    a = gallery.convection_diffusion_2d(10)
    dense = a.todense()
    b = np.ones(100)
    x_ref, it_ref, _ = np_ref.np_cgnr(dense, b, tol=RTOL, maxiter=2000)
    x, st = jcgnr(a.to_ell(), jnp.asarray(b), tol=RTOL, maxiter=2000)
    assert abs(int(st.iterations) - it_ref) <= BUDGET, (int(st.iterations), it_ref)


def test_parity_qmr():
    from kryst_tpu.solvers.qmr import qmr as jqmr

    a = gallery.convection_diffusion_2d(12)
    dense = a.todense()
    b = np.ones(144)
    x_ref, it_ref, _ = np_ref.np_qmr(dense, b, tol=RTOL, maxiter=600)
    x, st = jqmr(a.to_ell(), jnp.asarray(b), tol=RTOL, maxiter=600)
    assert abs(int(st.iterations) - it_ref) <= BUDGET, (int(st.iterations), it_ref)


def test_parity_tfqmr():
    from kryst_tpu.solvers.tfqmr import tfqmr as jtfqmr

    a = gallery.convection_diffusion_2d(12)
    dense = a.todense()
    b = np.ones(144)
    x_ref, it_ref, _ = np_ref.np_tfqmr(dense, b, tol=RTOL, maxiter=600)
    x, st = jtfqmr(a.to_ell(), jnp.asarray(b), tol=RTOL, maxiter=600)
    assert abs(int(st.iterations) - it_ref) <= BUDGET, (int(st.iterations), it_ref)


def test_parity_histories_track():
    # residual histories agree to a few percent along the way (not just
    # the endpoint) — catches silent algorithmic drift
    a = gallery.poisson_2d(24)
    dense = a.todense()
    b = np.ones(576)
    _, it_ref, hist_ref = np_ref.np_cg(dense, b, tol=RTOL, maxiter=1000)
    _, st = cg(a.to_ell(), jnp.asarray(b), tol=RTOL, maxiter=1000, record_history=True)
    hist = np.asarray(st.residual_history)
    k = min(it_ref, int(st.iterations))
    ours = hist[1 : k + 1]
    theirs = np.asarray(hist_ref[1 : k + 1])
    rel_err = np.abs(ours - theirs) / np.maximum(theirs, 1e-30)
    assert np.median(rel_err) < 0.05
