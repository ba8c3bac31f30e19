"""Mixed-precision iterative refinement tests: f64 accuracy from f32 inner
solves (the honest-rtol-1e-8-on-TPU path)."""
import jax.numpy as jnp
import numpy as np

from kryst_tpu import JacobiPC, pcg
from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import csr_to_dia
from kryst_tpu.solvers.gmres import gmres
from kryst_tpu.solvers.refine import iterative_refinement


def test_refinement_poisson_f32_inner():
    a = gallery.poisson_2d(32)
    A32 = csr_to_dia(a, dtype=np.float32)
    M32 = JacobiPC.setup(A32)
    b = np.random.default_rng(0).standard_normal(1024)

    def inner(rhs):
        return pcg(A32, rhs, M=M32, tol=1e-5, maxiter=500)

    x, info = iterative_refinement(a, b, inner, tol=1e-11)
    assert info["converged"], info["history"]
    # true f64 residual beyond anything f32 alone can reach
    r = b - a.todense() @ x
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-11
    # each outer pass contracts by roughly the inner tolerance
    h = info["history"]
    assert h[1] < 1e-3 * h[0]
    assert info["outer_iterations"] <= 4


def test_refinement_nonsymmetric_gmres_inner():
    a = gallery.convection_diffusion_2d(24)
    A32 = csr_to_dia(a, dtype=np.float32)
    from kryst_tpu.pc.ilu import ilu0_dia

    M32 = ilu0_dia(a, sweeps=6, dtype=np.float32)
    b = np.ones(576)

    def inner(rhs):
        return gmres(A32, rhs, M=M32, side="left", tol=1e-5, maxiter=300, restart=30)

    x, info = iterative_refinement(a, b, inner, tol=1e-10)
    assert info["converged"], info["history"]
    r = b - a.todense() @ x
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-10


def test_refinement_zero_rhs():
    a = gallery.poisson_2d(8)
    x, info = iterative_refinement(a, np.zeros(64), lambda r: (r, None), tol=1e-12)
    assert info["converged"]
    np.testing.assert_array_equal(x, 0)


def test_refine_device_poisson():
    # on-device outer loop (f64 emulation path; here CPU f64 is native)
    import jax

    from kryst_tpu.solvers.refine import refine_device

    a = gallery.poisson_2d(32)
    A64 = csr_to_dia(a, dtype=np.float64)
    A32 = csr_to_dia(a, dtype=np.float32)
    M32 = JacobiPC.setup(A32)
    b = np.random.default_rng(1).standard_normal(1024)

    def inner(rhs):
        return pcg(A32, rhs, M=M32, tol=1e-5, maxiter=500, true_residual=False)

    solve = jax.jit(lambda bb: refine_device(A64, bb, inner, tol=1e-11))
    x, st = solve(jnp.asarray(b))
    assert bool(st.converged), float(st.rel_residual)
    r = b - a.todense() @ np.asarray(x, dtype=np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-11
    assert int(st.outer_iterations) <= 4


def test_refine_device_zero_rhs():
    from kryst_tpu.solvers.refine import refine_device

    a = gallery.poisson_2d(8)
    A64 = csr_to_dia(a, dtype=np.float64)
    x, st = refine_device(A64, np.zeros(64), lambda r: (r, None), tol=1e-12)
    assert bool(st.converged)
    np.testing.assert_array_equal(np.asarray(x), 0)
