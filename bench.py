#!/usr/bin/env python
"""Benchmark: BASELINE headline config — 3-D Poisson 1M dof, time-to-tolerance.

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is measured against the BASELINE.md target of 1.0 s for the
1M-dof solve on one v5e chip (>1.0 = faster than target). Secondary
diagnostics go to stderr.

Timing methodology (round-2 correction): every host<->device exchange
through the axon relay costs ~29 ms RTT, and fetching a full vector
costs ~15 ms per 36 MB — round-1 numbers that amortized too few
in-loop iterations against full-array fetches were measuring the relay,
not the chip (and understated kernel speed by up to 40x). Here:
- per-iteration costs come from ITERATION-COUNT SLOPES between two runs
  inside single jit calls (RTT cancels exactly);
- syncs fetch only device-side scalars (jnp.sum / stats fields);
- wall-clock headline numbers are min-of-3 and, being single jit calls,
  include one RTT (~29 ms) — reported as-is, honestly.
"""
from __future__ import annotations

import json
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)  # f64 = emulated on TPU; the
    # refined headline runs its outer loop on device in f64 (solvers/refine.py)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from kryst_tpu import JacobiPC, pcg
    from kryst_tpu.matrix import gallery
    from kryst_tpu.ops.dia import csr_to_dia

    on_cpu = jax.default_backend() == "cpu"
    n3 = 100 if not on_cpu else 32  # 1M dof on TPU
    n = n3 ** 3
    log(f"backend: {jax.default_backend()}, assembling 3-D Poisson {n3}^3...")
    t0 = time.time()
    a = gallery.poisson_3d(n3)
    A = csr_to_dia(a, dtype=np.float32)
    b = jnp.ones(n, dtype=jnp.float32)
    M = JacobiPC.setup(A)
    log(f"setup {time.time()-t0:.1f}s")

    def slope(f, arg, lo, hi, reps=3):
        """Per-iteration time from the iteration-count slope (RTT cancels)."""
        ts = {}
        for it in (lo, hi):
            loop = jax.jit(
                lambda v, it=it: jnp.sum(
                    lax.fori_loop(0, it, lambda i, u: f(u), v)
                )
            )
            _ = float(loop(arg))
            best = 1e9
            for _r in range(reps):
                t1 = time.time()
                _ = float(loop(arg))
                best = min(best, time.time() - t1)
            ts[it] = best
        return (ts[hi] - ts[lo]) / (hi - lo)

    # --- HBM roofline calibration: non-foldable scale over a 512 MB
    # buffer. MUST be far beyond VMEM (128 MB): a 64 MB loop-carried array
    # stays VMEM-resident and reads 5+ TB/s — that is the VMEM roofline,
    # not HBM's (~650 GB/s measured here).
    sz = 128_000_000 if not on_cpu else 1_000_000
    big = jnp.asarray(
        np.random.default_rng(7).standard_normal(sz).astype(np.float32)
    )
    dt = slope(lambda u: u + 0.001 * jnp.abs(u), big, 20, 100)
    roofline = sz * 8 / dt
    log(f"HBM roofline (512MB scale): {roofline/1e9:.0f} GB/s")

    # --- DIA SpMV + PCG iteration cost at 1M dof ------------------------
    x0 = jnp.asarray(np.random.default_rng(3).standard_normal(n).astype(np.float32))
    traffic = (A.data.size + 2 * n) * 4
    dt = slope(lambda u: A.matvec(u) / 6.0, x0, 100, 700)
    spmv_gbps = traffic / dt / 1e9
    log(
        f"DIA SpMV 1M: {dt*1e6:.1f} us -> {spmv_gbps:.0f} GB/s effective "
        f"({100*spmv_gbps*1e9/roofline:.0f}% of HBM roofline; >100% = "
        "VMEM-resident working set, the design point at this size; the "
        "beyond-VMEM streaming kernel measures 775 GB/s at 8M dof)"
    )

    def pcg_iter_time(lo, hi):
        ts = {}
        for it in (lo, hi):
            f = jax.jit(
                lambda bb, it=it: pcg(
                    A, bb, M=M, tol=0.0, maxiter=it, true_residual=False
                )[1].iterations
            )
            _ = float(f(b))
            best = 1e9
            for _r in range(3):
                t1 = time.time()
                _ = float(f(b))
                best = min(best, time.time() - t1)
            ts[it] = best
        return (ts[hi] - ts[lo]) / (hi - lo)

    dt_it = pcg_iter_time(100, 700)
    log(f"PCG+Jacobi 1M: {dt_it*1e6:.1f} us/iteration (maxiter slope)")

    # --- converged PCG+Jacobi solve, honest wall (single jit call) ------
    tol = 1e-8
    solve = jax.jit(lambda A, b, M: pcg(A, b, M=M, tol=tol, maxiter=3000))
    x, st = solve(A, b, M)
    _ = float(st.iterations)
    t_solve = 1e9
    for _r in range(3):
        t0 = time.time()
        x, st = solve(A, b, M)
        _ = float(st.iterations)
        t_solve = min(t_solve, time.time() - t0)
    r = b - A.matvec(x)
    true_rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    log(
        f"PCG+Jacobi 1M converged: {t_solve*1e3:.0f} ms wall (incl ~29 ms "
        f"RTT), iters={int(st.iterations)}, reached_tol={bool(st.reached_tol)}, "
        f"rel={float(st.rel_residual):.2e}, true_rel={true_rel:.2e}"
    )

    t_best = t_solve
    size_tag = "1M" if n3 == 100 else f"{n3}cubed"
    metric = f"poisson3d_{size_tag}_pcg_jacobi_time_to_rtol1e-8_f32"
    t_refined = None
    try:
        from kryst_tpu.pc.gmg import GMGPC

        t0 = time.time()
        pc = GMGPC.setup(a, grid=(n3, n3, n3), nu_pre=2, nu_post=2, dtype=np.float32)
        log(f"GMG setup: {time.time()-t0:.1f}s")
        gsolve = jax.jit(lambda A, b, pc: pcg(A, b, M=pc, tol=tol, maxiter=100))
        xg, sg = gsolve(A, b, pc)
        _ = float(sg.iterations)
        t_gmg = 1e9
        for _r in range(3):
            t0 = time.time()
            xg, sg = gsolve(A, b, pc)
            _ = float(sg.iterations)
            t_gmg = min(t_gmg, time.time() - t0)
        log(
            f"PCG+GMG 1M: {t_gmg*1e3:.0f} ms wall, iters={int(sg.iterations)}, "
            f"reached_tol={bool(sg.reached_tol)}"
        )
        if bool(sg.reached_tol) and t_gmg < t_best:
            t_best = t_gmg
            metric = f"poisson3d_{size_tag}_pcg_multigrid_time_to_rtol1e-8_f32"

        # headline: mixed-precision refinement — TRUE f64 residual <= 1e-8
        # at f32 speed. Outer loop ON DEVICE (solvers/refine.py::refine_device):
        # the host-looped version pays ~29 ms relay RTT + vector transfers per
        # outer pass (measured 1.3 s vs ~0.12 s at 1M dof).
        from kryst_tpu.solvers.refine import refine_device

        A64 = csr_to_dia(a, dtype=np.float64)
        b64 = jnp.asarray(np.ones(n))
        import scipy.sparse as sp

        a_sp = sp.csr_matrix(
            (a.data.astype(np.float64), a.indices, a.indptr), shape=a.shape
        )

        def refined_wall(inner, label):
            solve_r = jax.jit(
                lambda bb: refine_device(A64, bb, inner, tol=1e-8, max_outer=6)
            )
            xr, st = solve_r(b64)
            _ = float(st.outer_iterations)
            best = 1e9
            for _rep in range(3):
                t1 = time.time()
                xr, st = solve_r(b64)
                _ = float(st.outer_iterations)
                best = min(best, time.time() - t1)
            # independent host verification of the TRUE residual
            rr = np.asarray(b64, np.float64) - a_sp @ np.asarray(xr, np.float64)
            host_rel = float(np.linalg.norm(rr) / np.linalg.norm(np.asarray(b64)))
            log(
                f"refined[{label}] (TRUE rtol<=1e-8) 1M: {best*1e3:.0f} ms, "
                f"outer={int(st.outer_iterations)}, inner={int(st.inner_iterations)}, "
                f"dev_rel={float(st.rel_residual):.2e}, host_rel={host_rel:.2e}"
            )
            return best if host_rel <= 1e-8 else None

        for attempt in range(3):  # remote-compile relay is occasionally flaky
            try:
                cands = []
                tj = refined_wall(
                    lambda rhs: pcg(A, rhs, M=M, tol=1e-5, maxiter=800,
                                    true_residual=False),
                    "jacobi",
                )
                if tj:
                    cands.append(tj)
                tg = refined_wall(
                    lambda rhs: pcg(A, rhs, M=pc, tol=1e-5, maxiter=40,
                                    true_residual=False),
                    "gmg",
                )
                if tg:
                    cands.append(tg)
                t_refined = min(cands) if cands else None
                break
            except Exception as e:
                t_refined = None
                log(f"refined attempt {attempt}: {type(e).__name__}: {e}")
                time.sleep(5)
    except Exception as e:  # diagnostics only — never break the bench
        log(f"GMG bench skipped: {type(e).__name__}: {e}")

    if t_refined is not None:
        metric = f"poisson3d_{size_tag}_refined_TRUE_rtol1e-8"
        t_best = t_refined
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(t_best, 4),
                "unit": "s",
                "vs_baseline": round(1.0 / t_best, 3) if t_best > 0 else 0.0,
            }
        )
    )


if __name__ == "__main__":
    main()
