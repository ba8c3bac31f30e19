"""Truncated-Neumann DIA-ILU tests (the TPU fast path for ILU applies)."""
import jax.numpy as jnp
import numpy as np

from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import csr_to_dia
from kryst_tpu.pc.ilu import ilu0, ilu0_dia
from kryst_tpu.solvers.gmres import gmres


def test_ilu0_dia_apply_converges_to_exact():
    # as sweeps -> inf the Neumann apply converges to the exact solve
    a = gallery.convection_diffusion_2d(12)
    r = jnp.asarray(np.random.default_rng(0).standard_normal(144))
    z_exact = np.asarray(ilu0(a).apply(r))
    errs = []
    for sw in (2, 8, 24):
        z = np.asarray(ilu0_dia(a, sweeps=sw).apply(r))
        errs.append(np.linalg.norm(z - z_exact))
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 1e-6 * np.linalg.norm(z_exact)


def test_ilu0_dia_gmres_iteration_delta():
    # documented trade: a few sweeps ~ exact ILU iteration counts
    a = gallery.convection_diffusion_2d(32)
    A = csr_to_dia(a)
    b = jnp.ones(1024)
    _, s_exact = gmres(A, b, M=ilu0(a), side="left", tol=1e-8, maxiter=400, restart=30)
    _, s_nm = gmres(A, b, M=ilu0_dia(a, sweeps=6), side="left", tol=1e-8, maxiter=400, restart=30)
    assert bool(s_nm.reached_tol)
    assert int(s_nm.iterations) <= int(s_exact.iterations) + 4


def test_ilu0_dia_is_jittable_pytree():
    import jax

    a = gallery.poisson_2d(10)
    M = ilu0_dia(a, sweeps=4)

    @jax.jit
    def apply(M, r):
        return M.apply(r)

    z = apply(M, jnp.ones(100))
    assert np.isfinite(np.asarray(z)).all()
