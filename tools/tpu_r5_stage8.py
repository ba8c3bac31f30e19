"""Round-5 stage 8: on-chip measurement of (a) the unrolled exact-ILU
apply (VERDICT item 4), (b) ca_gmres 8M with precomputed shifts + fused
shift epilogue + adaptive QR3 skip (VERDICT item 3).

Run: nohup python tools/tpu_r5_stage8.py > /tmp/r5_stage8.log 2>&1 &
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kryst_tpu.matrix import gallery  # noqa: E402
from kryst_tpu.ops.dia import csr_to_dia  # noqa: E402
from kryst_tpu.utils.chiprecord import append_chip_record  # noqa: E402


def rec(metric, value, unit, vs=None):
    print(f"RESULT {metric}: {value:.4f} {unit}", flush=True)
    append_chip_record(metric, value, unit, vs, source="tpu_r5_stage8")


def timeit(f, reps=3):
    best = 1e9
    for _ in range(reps):
        t = time.time()
        f()
        best = min(best, time.time() - t)
    return best


def slope(run, lo, hi, reps=3):
    run(lo)
    run(hi)
    t_lo = timeit(lambda: run(lo), reps)
    t_hi = timeit(lambda: run(hi), reps)
    return (t_hi - t_lo) / (hi - lo)


def main():
    print(f"devices: {jax.devices()}", flush=True)

    # ---- (a) exact-ILU GMRES at 256^2 with the unrolled solve ----------
    from kryst_tpu.pc.diagmajor import DiagMajorILU2D
    from kryst_tpu.solvers.gmres import gmres

    nx = 256
    a2 = gallery.convection_diffusion_2d(nx, beta=10.0)
    A2 = csr_to_dia(a2, dtype=np.float32)
    ilu = DiagMajorILU2D.setup(a2, (nx, nx), dtype=np.float32)
    b2 = jnp.ones(nx * nx, jnp.float32)
    fs = {}
    for it in (60, 560):
        fs[it] = jax.jit(
            lambda Aa, bb, Mm, it=it: gmres(
                Aa, bb, M=Mm, side="right", tol=0.0, maxiter=it, restart=30,
            )[1].iterations
        )
    dt = slope(lambda it: float(fs[it](A2, b2, ilu)), 60, 560)
    rec("gmres_ilu_exact_256sq_per_iteration_unrolled", dt * 1e6, "us",
        338.6 / (dt * 1e6))

    # ---- (b) ca_gmres at 8M: shifts reuse + fused epilogue -------------
    from kryst_tpu.solvers.ca_gmres import ca_gmres, newton_shifts

    n3 = 200
    n8 = n3 ** 3
    t0 = time.time()
    a8 = gallery.poisson_3d(n3)
    A8 = csr_to_dia(a8, dtype=np.float32, grid=(n3, n3, n3))
    b8 = jnp.ones(n8, jnp.float32)
    print(f"8M setup {time.time()-t0:.1f}s", flush=True)

    # bitwise sanity of the fused shift kernel on REAL hardware
    u = jnp.asarray(
        np.random.default_rng(2).standard_normal(n8).astype(np.float32)
    )
    up = 0.5 * u[::-1]
    f_sane = jax.jit(
        lambda Aa, uu, uup: Aa.matvec_shift(uu, uup, 0.37, 0.11, 0.83)
    )
    w, d2 = f_sane(A8, u, up)
    f_ref = jax.jit(
        lambda Aa, uu, uup: (Aa.matvec(uu) - 0.37 * uu + 0.11 * uup) * 0.83
    )
    wr = f_ref(A8, u, up)
    err = float(jnp.max(jnp.abs(w - wr)))
    d2err = abs(float(d2) - float(jnp.sum(wr * wr))) / float(jnp.sum(wr * wr))
    print(f"fused shift kernel: max abs err {err:.3e}, d2 rel {d2err:.3e}",
          flush=True)

    sh8 = jax.jit(
        lambda Aa, bb: newton_shifts(Aa, bb, s=30)
    )(A8, b8)
    sh8 = jax.tree_util.tree_map(lambda x: x.block_until_ready(), sh8)

    f_its = jax.jit(
        lambda A, bb, sh: ca_gmres(A, bb, tol=0.0, maxiter=60, restart=30,
                                   shifts=sh)[1].iterations
    )
    its_ca = int(f_its(A8, b8, sh8))
    print(f"its per solve: {its_ca}", flush=True)

    def mk_ca(nrep):
        def f_impl(A, bb, sh):
            def step(carry, _):
                x, _s = ca_gmres(A, carry, tol=0.0, maxiter=60, restart=30,
                                 shifts=sh)
                return carry + 1e-6 * x, None

            return jnp.sum(lax.scan(step, bb, None, length=nrep)[0])

        f = jax.jit(f_impl)
        return lambda: float(f(A8, b8, sh8))

    r1 = mk_ca(1)
    r3 = mk_ca(3)
    r1()
    r3()
    t1 = timeit(r1, reps=2)
    t3 = timeit(r3, reps=2)
    dt_solve = (t3 - t1) / 2
    dt_ca = dt_solve / max(its_ca, 1)
    rec("ca_gmres30_8M_per_iteration_r5", dt_ca * 1e3, "ms",
        1.09 / (dt_ca * 1e3))


if __name__ == "__main__":
    main()
