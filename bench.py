#!/usr/bin/env python
"""Benchmark: one JSON line per BASELINE config (VERDICT r2 item 5).

Emits several lines of the form
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
with the HEADLINE (config 4, 1M-dof refined TRUE rtol<=1e-8) printed
LAST, so drivers that keep only the final line still record the headline.

vs_baseline conventions (BASELINE.md):
- configs with a time target (4): target_seconds / value  (>1 = faster).
- configs whose BASELINE target is iteration parity (1): oracle_iters /
  iters (1.0 = parity).
- kernel-bound metrics (8M GMRES/BiCGStab per-iteration): traffic-bound
  estimate / measured (1.0 = at the HBM roofline).

Timing methodology (round-2 correction, see CLAUDE.md): per-iteration
costs from ITERATION-COUNT SLOPES inside single jit calls (the ~29 ms
relay RTT cancels); syncs fetch scalars only; wall numbers are min-of-3
single-jit calls and include one RTT, reported as-is.
"""
from __future__ import annotations

import json
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


_METRIC_SUFFIX = ""  # "_cpu_fallback" when the TPU relay is wedged


def emit(metric, value, unit, vs_baseline):
    # On the CPU fallback the BASELINE targets (sized for the TPU chip)
    # do not apply — a 32^3 CPU solve beating a 1M-dof 1 s target by 92x
    # is meaningless (VERDICT r3). Emit null instead of a flattering ratio.
    if _METRIC_SUFFIX:
        vs_baseline = None
    print(
        json.dumps(
            {
                "metric": metric + _METRIC_SUFFIX,
                "value": round(float(value), 5),
                "unit": unit,
                "vs_baseline": (
                    None if vs_baseline is None else round(float(vs_baseline), 3)
                ),
            }
        ),
        flush=True,
    )
    if not _METRIC_SUFFIX:
        # wedge-proof evidence (VERDICT r4 item 2): persist every
        # real-chip metric to the committed BENCH_TPU.jsonl so a later
        # wedged-relay snapshot can still replay dated, git-pinned
        # TPU numbers
        try:
            from kryst_tpu.utils.chiprecord import append_chip_record, on_real_tpu

            if on_real_tpu():
                append_chip_record(metric, value, unit, vs_baseline)
        except Exception as e:  # never let bookkeeping kill the bench
            log(f"chip-record append failed: {type(e).__name__}: {e}")


def replay_chip_records(headline_metric="refined_TRUE_rtol1e-8"):
    """CPU-fallback path: re-print the latest committed on-chip record
    per metric (dated + git-pinned — NOT fresh numbers; the ``ts`` and
    ``git`` fields say exactly when/what was measured). Printed after
    the CPU metrics, headline last, so a driver keeping only the final
    stdout line still records a real TPU headline."""
    try:
        from kryst_tpu.utils.chiprecord import latest_records
    except Exception:
        return
    recs = latest_records()
    if not recs:
        log("no committed BENCH_TPU.jsonl records to replay")
        return
    recs.sort(key=lambda r: headline_metric in r["metric"])
    log(f"replaying {len(recs)} recorded TPU metrics (relay wedged now; "
        "these are dated records, not fresh measurements)")
    for r in recs:
        out = dict(r)
        out["recorded"] = True
        print(json.dumps(out), flush=True)


def _tpu_responsive(timeouts=(150, 180, 300)) -> bool:
    """Probe the TPU relay in a SUBPROCESS with a hard timeout.

    A killed remote compile can wedge the relay for hours — even
    jax.devices() blocks (CLAUDE.md). Probing in-process would hang this
    benchmark forever; a wedged relay should instead fall back to CPU so
    the driver still records metrics (marked by the backend log line).

    Retries with growing timeouts: a single-shot probe proved brittle —
    the relay serializes for minutes behind a just-exited client session
    (measured round 5: a 420 s probe timed out at T+0 while the same
    probe ran in 6 s at T+9 min), and one transient miss used to forfeit
    the whole run's on-chip evidence. A truly wedged relay still fails
    every attempt and falls back after ~10 min total.
    """
    import os
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "axon") == "cpu":
        return False
    code = (
        "import jax; "
        "jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache'); "
        "import jax.numpy as jnp; print(float(jnp.sum(jnp.ones(8))))"
    )
    for i, timeout_s in enumerate(timeouts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=timeout_s,
                capture_output=True,
            )
            if r.returncode == 0:
                return True
            log(f"TPU probe attempt {i + 1} exited {r.returncode}")
        except (subprocess.TimeoutExpired, OSError) as e:
            log(f"TPU probe attempt {i + 1}: {type(e).__name__}")
        time.sleep(10)
    return False


def main():
    import jax

    forced_cpu = (getattr(jax.config, "jax_platforms", None) or "") == "cpu"
    if not forced_cpu and not _tpu_responsive():
        # tag every metric so a driver recording only the stdout JSON
        # cannot mistake CPU-measured values for TPU ones
        global _METRIC_SUFFIX
        _METRIC_SUFFIX = "_cpu_fallback"
        log("TPU relay unresponsive -> forcing CPU backend")
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp
    from jax import lax

    from kryst_tpu import JacobiPC, pcg
    from kryst_tpu.matrix import gallery
    from kryst_tpu.ops.dia import csr_to_dia

    on_cpu = jax.default_backend() == "cpu"
    log(f"backend: {jax.default_backend()}")

    def sync(v):
        return float(v)

    def min_wall(fn, reps=3):
        fn()  # compile
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best

    def slope(make, lo, hi, reps=3):
        ts = {}
        for it in (lo, hi):
            f = make(it)
            sync(f())
            best = 1e9
            for _ in range(reps):
                t0 = time.time()
                sync(f())
                best = min(best, time.time() - t0)
            ts[it] = best
        return (ts[hi] - ts[lo]) / (hi - lo)

    # ---------------- config 1: PCG+Jacobi, 2-D Poisson 128^2 ----------
    # iteration-parity metric vs the NumPy f64 oracle, so the device solve
    # must run f64 too (an f32 run grinds ~70 extra iterations at its
    # eps*kappa floor before the recursive residual reads 1e-8)
    try:
        a1 = gallery.poisson_2d(128)
        A1 = csr_to_dia(a1, dtype=np.float64)
        b1 = jnp.ones(128 * 128, jnp.float64)
        M1 = JacobiPC.setup(A1)
        f1 = jax.jit(lambda A, b, M: pcg(A, b, M=M, tol=1e-8, maxiter=2000))
        x1, s1 = f1(A1, b1, M1)
        iters1 = int(s1.iterations)
        from kryst_tpu.oracle.np_ref import np_pcg

        d1 = np.asarray(
            sp.csr_matrix((a1.data, a1.indices, a1.indptr), shape=a1.shape).diagonal()
        )
        _, oracle1, _h = np_pcg(
            sp.csr_matrix((a1.data, a1.indices, a1.indptr), shape=a1.shape),
            np.ones(128 * 128), lambda r: r / d1, tol=1e-8, maxiter=2000,
        )
        log(f"config1: pcg+jacobi 128^2 iters={iters1} oracle={oracle1}")
        emit("config1_poisson2d_128_pcg_jacobi_iters", iters1, "iterations",
             oracle1 / max(iters1, 1))
    except Exception as e:
        log(f"config1 failed: {type(e).__name__}: {e}")

    # ------- config 2: GMRES(30)+ILU(0), conv-diff 256^2 ---------------
    # perf metrics ride the TPU fast path (ilu0_dia truncated-Neumann
    # apply, +0-1 iterations vs exact); the exact antidiagonal-major
    # apply is emitted as its own metric — its ~2*grid sequential scan
    # steps are the honest cost of exact lexicographic semantics.
    try:
        from kryst_tpu.pc.diagmajor import DiagMajorILU2D
        from kryst_tpu.pc.ilu import ilu0_dia
        from kryst_tpu.solvers.gmres import gmres
        from kryst_tpu.solvers.refine import refine_device

        a2 = gallery.convection_diffusion_2d(256, beta=10.0)
        A2 = csr_to_dia(a2, dtype=np.float32)
        A2_64 = csr_to_dia(a2, dtype=np.float64)
        pc2 = ilu0_dia(a2, dtype=np.float32)
        pc2x = DiagMajorILU2D.setup(a2, (256, 256), dtype=np.float32)
        b2 = jnp.ones(256 * 256, jnp.float32)

        def per_iter2(pc):
            return slope(
                lambda it: (
                    lambda f=jax.jit(
                        lambda A, b, M, it=it: gmres(
                            A, b, M=M, side="right", tol=0.0, maxiter=it,
                            restart=30,
                        )[1].iterations
                    ): f(A2, b2, pc)
                ),
                # span must dwarf today's relay-RTT jitter: at ~50 us/iter
                # a 120-iter delta is 6 ms and can slope NEGATIVE (seen
                # round 4); 500 iters = 25+ ms of real signal
                60, 560, reps=3,
            )

        dt2 = per_iter2(pc2)
        log(f"config2: GMRES(30)+ilu0_dia 256^2: {dt2*1e6:.1f} us/iter")
        dt2x = per_iter2(pc2x)
        log(f"config2: GMRES(30)+exact diagmajor ILU0: {dt2x*1e6:.1f} us/iter")
        emit("config2_gmres30_exact_diagmajor_ilu0_per_iteration",
             dt2x * 1e6, "us", dt2 / dt2x)

        inner2 = lambda A, r, M: gmres(
            A, r, M=M, side="right", tol=1e-5, maxiter=400, restart=30
        )
        ref2 = jax.jit(
            lambda A64, A, M, b64: refine_device(
                A64, b64, lambda r: inner2(A, r, M), tol=1e-8, max_outer=6
            )
        )
        b2_64 = jnp.ones(256 * 256)
        t2 = min_wall(lambda: sync(ref2(A2_64, A2, pc2, b2_64)[1].outer_iterations))
        xr2, st2 = ref2(A2_64, A2, pc2, b2_64)
        a2_sp = sp.csr_matrix(
            (a2.data.astype(np.float64), a2.indices, a2.indptr), shape=a2.shape
        )
        host_rel2 = float(
            np.linalg.norm(np.ones(256 * 256) - a2_sp @ np.asarray(xr2))
            / np.linalg.norm(np.ones(256 * 256))
        )
        log(f"config2 refined TRUE<=1e-8: {t2*1e3:.0f} ms (host_rel {host_rel2:.2e})")
        if host_rel2 <= 1e-8:
            emit("config2_convdiff256_gmres30_ilu0_refined_TRUE_rtol1e-8",
                 t2, "s", 1.0 / t2)
        emit("config2_gmres30_ilu0_per_iteration", dt2 * 1e6, "us", 1.0)

        # beyond parity: nonsymmetric GMG collapses the iteration count
        # (measured CPU f64 at 256^2 beta=10: 17 GMRES its vs ~380 ILU0)
        from kryst_tpu.pc.gmg import GMGPC as _GMG

        pc2g = _GMG.setup(a2, grid=(256, 256), dtype=np.float32,
                          nu_pre=2, nu_post=2, smoother="chebyshev")
        inner2g = lambda A, r, M: gmres(
            A, r, M=M, side="right", tol=1e-5, maxiter=120, restart=30
        )
        ref2g = jax.jit(
            lambda A64, A, M, b64: refine_device(
                A64, b64, lambda r: inner2g(A, r, M), tol=1e-8, max_outer=6
            )
        )
        t2g = min_wall(lambda: sync(ref2g(A2_64, A2, pc2g, b2_64)[1].outer_iterations))
        xr2g, _ = ref2g(A2_64, A2, pc2g, b2_64)
        host_rel2g = float(
            np.linalg.norm(np.ones(256 * 256) - a2_sp @ np.asarray(xr2g))
            / np.linalg.norm(np.ones(256 * 256))
        )
        log(f"config2 GMG-refined TRUE<=1e-8: {t2g*1e3:.0f} ms (host_rel {host_rel2g:.2e})")
        if host_rel2g <= 1e-8:
            emit("config2_convdiff256_gmres30_gmg_refined_TRUE_rtol1e-8",
                 t2g, "s", 1.0 / t2g)
    except Exception as e:
        log(f"config2 failed: {type(e).__name__}: {e}")

    # ------- config 3: proxies (bcsstk/thermal/atmosmodd-like) ---------
    try:
        from kryst_tpu.pc.chebyshev import ChebyshevPC
        from kryst_tpu.pc.sor import SORPC, SweepType, ssor
        from kryst_tpu.solvers.bicgstab import bicgstab

        t3_total = 0.0
        a3 = gallery.bcsstk_like(48)
        A3 = a3.to_dense_operator(dtype=jnp.float32)
        pc3 = ChebyshevPC.setup(A3, degree=12)  # Lanczos auto-bounds
        b3 = jnp.ones(a3.shape[0], jnp.float32)
        f3 = jax.jit(lambda A, b, M: pcg(A, b, M=M, tol=1e-6, maxiter=2000))
        t3_total += min_wall(lambda: sync(f3(A3, b3, pc3)[1].iterations))

        a3b = gallery.thermal_like(24)
        A3b = csr_to_dia(a3b, dtype=np.float32)
        pc3b = ssor(a3b, omega=1.3, dtype=np.float32)
        b3b = jnp.ones(576, jnp.float32)
        f3b = jax.jit(lambda A, b, M: pcg(A, b, M=M, tol=1e-6, maxiter=1000))
        t3_total += min_wall(lambda: sync(f3b(A3b, b3b, pc3b)[1].iterations))

        a3c = gallery.atmosmodd_like(10)
        A3c = a3c.to_ell(dtype=jnp.float32)
        pc3c = SORPC.setup(a3c, omega=1.0, sweep=SweepType.FORWARD, dtype=np.float32)
        b3c = jnp.ones(1000, jnp.float32)
        f3c = jax.jit(lambda A, b, M: bicgstab(A, b, M=M, tol=1e-6, maxiter=500))
        t3_total += min_wall(lambda: sync(f3c(A3c, b3c, pc3c)[1].iterations))
        log(f"config3 proxies (minres/cheb + pcg/ssor + bicgstab/sor): {t3_total*1e3:.0f} ms total")
        emit("config3_proxy_suite_total_wall", t3_total, "s", 1.0 / t3_total)
    except Exception as e:
        log(f"config3 failed: {type(e).__name__}: {e}")

    # ---- config 3 on REAL SuiteSparse matrices (fetch-or-skip) --------
    # BASELINE names bcsstk/thermal/atmosmodd; this host has no network
    # egress, so bench runs whatever MatrixMarket files are already on
    # disk (KRYST_TPU_SUITESPARSE_DIR, default /root/repo/data) and
    # skips with a log line otherwise.
    try:
        from kryst_tpu.matrix.mm import available_suitesparse, load_suitesparse
        from kryst_tpu.oracle.np_ref import np_bicgstab, np_minres

        names = ["bcsstk14", "bcsstk18", "thermal1", "thermal2", "atmosmodd"]
        found = available_suitesparse(names)
        if not found:
            log("config3 real matrices: none on disk (no egress) — "
                "proxies above stand in; drop .mtx files in "
                "KRYST_TPU_SUITESPARSE_DIR to enable")
        for nm in found:
            from kryst_tpu.solvers.minres import minres as _minres

            a_r = load_suitesparse(nm)
            a_sp = sp.csr_matrix(
                (a_r.data, a_r.indices, a_r.indptr), shape=a_r.shape
            )
            symr = (abs(a_sp - a_sp.T).max() <= 1e-12 * abs(a_sp).max())
            A_r = a_r.to_device_operator(dtype=np.float64)
            b_r = jnp.ones(a_r.shape[0])
            if symr:
                x_r, s_r = jax.jit(
                    lambda A, b: _minres(A, b, tol=1e-8, maxiter=4000)
                )(A_r, b_r)
                _, o_it, _ = np_minres(a_sp, np.ones(a_r.shape[0]),
                                       tol=1e-8, maxiter=4000)
                lbl = f"config3_{nm}_minres_iters"
            else:
                from kryst_tpu.solvers.bicgstab import bicgstab as _bicg

                x_r, s_r = jax.jit(
                    lambda A, b: _bicg(A, b, tol=1e-8, maxiter=4000)
                )(A_r, b_r)
                _, o_it, _ = np_bicgstab(a_sp, np.ones(a_r.shape[0]),
                                         tol=1e-8, maxiter=4000)
                lbl = f"config3_{nm}_bicgstab_iters"
            its_r = int(s_r.iterations)
            log(f"config3 {nm}: iters={its_r} oracle={o_it} "
                f"reached={bool(s_r.reached_tol)}")
            emit(lbl, its_r, "iterations", o_it / max(its_r, 1))
    except Exception as e:
        log(f"config3 real-matrix suite failed: {type(e).__name__}: {e}")

    # ------------- config 4 (+ kernels): 3-D Poisson 1M ----------------
    n3 = 100 if not on_cpu else 32
    n = n3 ** 3
    t0 = time.time()
    a = gallery.poisson_3d(n3)
    A = csr_to_dia(a, dtype=np.float32)
    b = jnp.ones(n, dtype=jnp.float32)
    M = JacobiPC.setup(A)
    log(f"config4 setup ({n3}^3): {time.time()-t0:.1f}s")

    x0 = jnp.asarray(np.random.default_rng(3).standard_normal(n).astype(np.float32))
    dt = slope(
        lambda it: (
            lambda f=jax.jit(
                lambda v, it=it: jnp.sum(
                    lax.fori_loop(0, it, lambda i, u: A.matvec(u) / 6.0, v)
                )
            ): f(x0)
        ),
        200, 3200,
    )
    traffic = (A.data.size + 2 * n) * 4
    log(f"DIA SpMV 1M: {dt*1e6:.1f} us -> {traffic/dt/1e9:.0f} GB/s effective")
    emit("dia_spmv_1M_per_call", dt * 1e6, "us", (traffic / dt / 1e9) / 616.0)

    # block-Krylov multi-RHS amortization: one coefficient pass + (k, k)
    # MXU reductions for 8 RHS vs 8 independent PCG runs
    try:
        from kryst_tpu.solvers.block_cg import block_pcg

        B8 = jnp.asarray(
            np.random.default_rng(5).standard_normal((n, 8)).astype(np.float32)
        )
        dt_blk = slope(
            lambda it: (
                lambda f=jax.jit(
                    lambda Aa, Bb, Mm, it=it: block_pcg(
                        Aa, Bb, M=Mm, tol=0.0, maxiter=it
                    )[1].iterations
                ): f(A, B8, M)
            ),
            50, 150, reps=2,
        )
        dt_pcg1 = slope(
            lambda it: (
                lambda f=jax.jit(
                    lambda Aa, bb, Mm, it=it: pcg(
                        Aa, bb, M=Mm, tol=0.0, maxiter=it,
                        true_residual=False,
                    )[1].iterations
                ): f(A, b, M)
            ),
            # ~24 us/iter: need >= 1000-iter span to clear relay jitter
            200, 1400, reps=3,
        )
        per_rhs = dt_blk / 8.0
        log(
            f"block_pcg 1M k=8: {dt_blk*1e6:.1f} us/block-iter "
            f"({per_rhs*1e6:.1f} us/RHS vs {dt_pcg1*1e6:.1f} single)"
        )
        # the flagship resident-size loop the round-5 layout fix restored
        # (VERDICT r4 weak #1): baseline is round-2's 23.8 us/iter by the
        # same slope methodology
        emit("pcg_jacobi_1M_per_iteration", dt_pcg1 * 1e6, "us",
             23.8e-6 / dt_pcg1)
        emit("block_pcg_1M_k8_per_iteration_per_rhs", per_rhs * 1e6, "us",
             dt_pcg1 / per_rhs)
    except Exception as e:
        log(f"block_pcg bench failed: {type(e).__name__}: {e}")

    size_tag = "1M" if n3 == 100 else f"{n3}cubed"
    t_refined = None
    try:
        from kryst_tpu.pc.gmg import GMGPC
        from kryst_tpu.solvers.refine import refine_device

        t0 = time.time()
        pc = GMGPC.setup(a, grid=(n3, n3, n3), nu_pre=2, nu_post=2,
                 dtype=np.float32, smoother="chebyshev", symmetric=True)
        log(f"GMG setup: {time.time()-t0:.1f}s")
        A64 = csr_to_dia(a, dtype=np.float64)
        b64 = jnp.asarray(np.ones(n))
        a_sp = sp.csr_matrix(
            (a.data.astype(np.float64), a.indices, a.indptr), shape=a.shape
        )

        def refined_wall(make_inner, ops, label):
            # operators/PCs as jit ARGUMENTS, never closures: closed-over
            # arrays embed in the HLO as literals and the remote-compile
            # relay rejects big request bodies (HTTP 413 at 8M)
            solve_r = jax.jit(
                lambda A64_, bb, ops_: refine_device(
                    A64_, bb, lambda r: make_inner(ops_, r),
                    tol=1e-8, max_outer=6,
                )
            )
            best = min_wall(
                lambda: sync(solve_r(A64, b64, ops)[1].outer_iterations)
            )
            xr, st = solve_r(A64, b64, ops)
            rr = np.asarray(b64) - a_sp @ np.asarray(xr)
            host_rel = float(np.linalg.norm(rr) / np.linalg.norm(np.asarray(b64)))
            log(
                f"refined[{label}] {size_tag}: {best*1e3:.0f} ms, "
                f"outer={int(st.outer_iterations)}, inner={int(st.inner_iterations)}, "
                f"host_rel={host_rel:.2e}"
            )
            return best if host_rel <= 1e-8 else None

        for attempt in range(3):  # remote-compile relay is occasionally flaky
            try:
                cands = []
                tj = refined_wall(
                    lambda ops, rhs: pcg(ops[0], rhs, M=ops[1], tol=1e-5,
                                         maxiter=800, true_residual=False),
                    (A, M), "jacobi",
                )
                if tj:
                    cands.append(tj)
                tg = refined_wall(
                    lambda ops, rhs: pcg(ops[0], rhs, M=ops[1], tol=1e-5,
                                         maxiter=40, true_residual=False),
                    (A, pc), "gmg",
                )
                if tg:
                    cands.append(tg)
                t_refined = min(cands) if cands else None
                break
            except Exception as e:
                t_refined = None
                log(f"refined attempt {attempt}: {type(e).__name__}: {e}")
                time.sleep(5)

        # RTT-free refined-solve cost: the one-call wall above includes
        # one host<->device relay round trip that drifts ~20 ms between
        # sessions (CLAUDE.md) — at 1M it is MOST of the wall. Chain k
        # refined solves with a data dependency inside one jit and slope
        # over k: the honest per-solve device cost.
        try:
            def mk_ref(nrep):
                def f_impl(A64_, bb, ops_):
                    def step(carry, _):
                        x, st = refine_device(
                            A64_, carry,
                            lambda r: pcg(ops_[0], r, M=ops_[1], tol=1e-5,
                                          maxiter=40, true_residual=False),
                            tol=1e-8, max_outer=6,
                        )
                        return carry + 1e-6 * x, st.outer_iterations

                    return jnp.sum(
                        lax.scan(step, bb, None, length=nrep)[1]
                    )

                f = jax.jit(f_impl)
                return lambda: sync(f(A64, b64, (A, pc)))

            r1, r3 = mk_ref(1), mk_ref(3)
            r1(); r3()
            t1 = min(min_wall(r1), min_wall(r1))
            t3 = min_wall(r3)
            dt_ref = (t3 - t1) / 2
            log(f"refined[gmg] {size_tag} per-solve slope: {dt_ref*1e3:.1f} ms")
            emit(f"poisson3d_{size_tag}_refined_per_solve_slope",
                 dt_ref * 1e3, "ms", 1.0 / dt_ref)
        except Exception as e:
            log(f"refined slope failed: {type(e).__name__}: {e}")

        # device-born operator + fully device-side GMG setup at this size
        # (round-5 stage 13): same solve quality, setup without host
        # assembly/upload. Existing host-path metrics above are kept
        # unchanged for cross-round continuity; these are additive.
        try:
            from kryst_tpu.ops.dia import stencil_to_dia

            Ad = stencil_to_dia(6.0, -1.0, -1.0, (n3, n3, n3),
                                dtype=np.float32)
            pcd = GMGPC.setup(Ad, (n3, n3, n3), nu_pre=2, nu_post=2,
                              smoother="chebyshev", rap="probe")
            t0 = time.time()
            pcd = GMGPC.setup(Ad, (n3, n3, n3), nu_pre=2, nu_post=2,
                              smoother="chebyshev", rap="probe")
            emit(f"gmg_{size_tag}_setup_device_wall_warm",
                 time.time() - t0, "s", None)
            log(f"GMG {size_tag} device setup (warm): {time.time()-t0:.2f}s")
            td = refined_wall(
                lambda ops, rhs: pcg(ops[0], rhs, M=ops[1], tol=1e-5,
                                     maxiter=40, true_residual=False),
                (Ad, pcd), "gmg-device",
            )
            if td:
                emit(f"poisson3d_{size_tag}_refined_device_setup_TRUE_rtol1e-8",
                     td, "s", 1.0 / td)
        except Exception as e:
            log(f"device-setup bench failed: {type(e).__name__}: {e}")
    except Exception as e:
        log(f"GMG/refined bench failed: {type(e).__name__}: {e}")

    # ------------- config 4 at 8M + beyond-VMEM kernel metrics ---------
    if not on_cpu:
        try:
            from kryst_tpu.pc.gmg import GMGPC
            from kryst_tpu.solvers.bicgstab import bicgstab
            from kryst_tpu.solvers.gmres import gmres
            from kryst_tpu.solvers.refine import refine_device

            t0 = time.time()
            n8 = 200 ** 3
            # device-born operator (round-5 stage 13): panels + streaming
            # layout are written straight into HBM by one small compiled
            # graph — no host assembly and no ~340 MB relay upload.
            # Bitwise-equal to csr_to_dia(poisson_3d(200), grid=...)
            # (tests/test_stencil_device.py), and the operator pytree has
            # the identical structure, so every solver jit cache entry is
            # shared with the old path.
            from kryst_tpu.ops.dia import stencil_to_dia

            A8 = stencil_to_dia(6.0, -1.0, -1.0, (200, 200, 200),
                                dtype=np.float32)
            b8 = jnp.ones(n8, jnp.float32)
            log(f"8M operator (device-built): {time.time()-t0:.0f}s")
            # host CSR kept ONLY for the independent scipy true-residual
            # verification below (not on the framework path)
            t0 = time.time()
            a8 = gallery.poisson_3d(200)
            log(f"8M host CSR for verification: {time.time()-t0:.0f}s")

            # beyond-VMEM GMRES(30)/BiCGStab per-iteration (VERDICT item 1)
            def gmres8_per_iter(orthog):
                return slope(
                    lambda it: (
                        lambda f=jax.jit(
                            lambda A, bb, it=it: gmres(
                                A, bb, tol=0.0, maxiter=it, restart=30,
                                orthog=orthog,
                            )[1].iterations
                        ): f(A8, b8)
                    ),
                    30, 90, reps=2,
                )

            # traffic bound per iteration: SpMV + CGS passes. The SpMV
            # bytes come from the operator's actual streamed layout —
            # the planned panels are auto-bf16 here (Poisson stencil
            # coefficients are bf16-exact, round-4 _make_dia policy), so
            # the panel stream is half of f32. Panel-orthogonalization
            # reads: 2 prefix passes each for dots + correction; the
            # 8-row chunk switch reads avg ~20 of 31 rows; ~6 vector
            # touches. cgs2 (the default — the reference's
            # twice-is-enough policy, gmres.rs:83-96) pays 2 passes;
            # single-pass cgs is the perf option for well-conditioned
            # bases.
            if A8.data_blk is not None:
                spmv_bytes = (
                    A8.data_blk.size * A8.data_blk.dtype.itemsize + 2 * n8 * 4
                )
            else:  # const-stencil kernel: x + y only
                spmv_bytes = 2 * n8 * 4

            def est_gmres(passes):
                return (spmv_bytes + passes * 2 * 20 * n8 * 4
                        + 6 * n8 * 4) / 650e9

            dt_g = gmres8_per_iter("cgs2")
            est2 = est_gmres(2)
            log(f"gmres(30) 8M cgs2: {dt_g*1e3:.2f} ms/iter (traffic-bound ~{est2*1e3:.2f} ms)")
            emit("gmres30_8M_per_iteration", dt_g * 1e3, "ms", est2 / dt_g)
            dt_g1 = gmres8_per_iter("cgs")
            est1 = est_gmres(1)
            log(f"gmres(30) 8M single-pass cgs: {dt_g1*1e3:.2f} ms/iter (traffic-bound ~{est1*1e3:.2f} ms)")
            emit("gmres30_8M_cgs_per_iteration", dt_g1 * 1e3, "ms",
                 est1 / dt_g1)

            dt_b = slope(
                lambda it: (
                    lambda f=jax.jit(
                        lambda A, bb, it=it: bicgstab(A, bb, tol=0.0, maxiter=it)[
                            1
                        ].iterations
                    ): f(A8, b8)
                ),
                20, 60, reps=2,
            )
            est_b = (2 * spmv_bytes + 22 * n8 * 4) / 650e9
            log(f"bicgstab 8M: {dt_b*1e3:.2f} ms/iter (traffic-bound ~{est_b*1e3:.2f} ms)")
            emit("bicgstab_8M_per_iteration", dt_b * 1e3, "ms", est_b / dt_b)

            # multi-vector streamed SpMV (ROADMAP 0b): one coefficient-
            # panel pass for all k columns, through the transpose-free
            # (k, n) rows-of-columns entry the block solvers use
            # internally (round 4 — the (n, k) entry's two strided layout
            # transposes measured ~4.5x the kernel's own cost). Uses a
            # PLANNED (non-const) DIA operator — the const-stencil
            # 7-point A8 has zero panel traffic, so the panel
            # amortization only shows on operators that stream
            # coefficients.
            try:
                A8p = csr_to_dia(a8, dtype=np.float32)
                kblk = 8
                Xk0 = jnp.asarray(
                    np.random.default_rng(0)
                    .standard_normal((kblk, n8))
                    .astype(np.float32)
                )

                from kryst_tpu.ops.streamed import interleave_cols

                Xi0 = jax.jit(
                    lambda X: interleave_cols(X, A8p.plan)
                )(Xk0)

                def mk_blk(it):
                    f = jax.jit(
                        lambda A, X, it=it: jax.lax.fori_loop(
                            0, it,
                            lambda t, Xc: A.matvec_inter(Xc, kblk) * 0.12,
                            X,
                        )[0, 0]
                    )
                    return lambda: f(A8p, Xi0)

                dt_blk8 = slope(mk_blk, 8, 24, reps=2)
                # traffic/call: panels once + k x (3x + y) (the carrier
                # kernel's three block-indexed input views)
                pbytes = A8p.data_blk.size * A8p.data_blk.dtype.itemsize
                est_blk = (pbytes + 4 * kblk * n8 * 4) / 650e9
                log(
                    f"block matvec 8M k={kblk} (carrier): {dt_blk8*1e3:.2f} ms/call "
                    f"(traffic-bound ~{est_blk*1e3:.2f} ms; the (k, n) "
                    f"path measured 6.16, per-column 9.15)"
                )
                emit("block_matvec_8M_k8_per_call", dt_blk8 * 1e3, "ms",
                     est_blk / dt_blk8)

                # fused matvec+gram (block PCG's Q = A P, T = P^T Q from
                # ONE kernel): same traffic bound as the matvec alone —
                # the Gram accumulates in SMEM from resident blocks,
                # replacing carrier_gram's two extra streamed reads
                def mk_blk_g(it):
                    f = jax.jit(
                        lambda A, X, it=it: jax.lax.fori_loop(
                            0, it,
                            lambda t, Xc: (
                                lambda r: r[0] * 0.12 + r[1][0, 0] * 1e-20
                            )(A.matvec_inter(Xc, kblk, with_gram=True)),
                            X,
                        )[0, 0]
                    )
                    return lambda: f(A8p, Xi0)

                dt_blkg = slope(mk_blk_g, 8, 24, reps=2)
                log(
                    f"block matvec+gram 8M k={kblk} (fused): "
                    f"{dt_blkg*1e3:.2f} ms/call (matvec alone "
                    f"{dt_blk8*1e3:.2f}; unfused adds a carrier_gram pass)"
                )
                emit("block_matvec_gram_8M_k8_fused_per_call",
                     dt_blkg * 1e3, "ms", est_blk / dt_blkg)
                del A8p, Xk0, Xi0
            except Exception as e:
                log(f"block matvec 8M bench failed: {type(e).__name__}: {e}")

            # s-step CA-GMRES is the MEMORY-avoiding GMRES beyond VMEM:
            # BCGS2/CholeskyQR2 touch the basis ~4x per s-BLOCK where
            # CGS2 panels touch the active prefix 4x per ITERATION —
            # ~22 vector-touches/iter at s=m=30 vs ~80 for cgs2.
            # (Same s-step blocks that buy comm-avoidance on a mesh buy
            # HBM-traffic avoidance on one chip.)
            from kryst_tpu.solvers.ca_gmres import ca_gmres

            # Measurement note (fixes the bogus round-3 number): slope
            # over MAXITER is wrong for ca_gmres — its stall guard exits
            # after the same number of restarts at tol=0 regardless of
            # maxiter, so the maxiter-slope measured early-exit (~0 ms).
            # Instead scan NREP chained solves (data-dependent carry so
            # nothing hoists) and slope over NREP; divide by the
            # iteration count ONE solve actually performs.
            # Newton shifts are operator-only state: compute ONCE and
            # reuse across solves (the in-solve 12-step prepass costs
            # ~18 ms/solve = 0.6 ms/iter of a 30-iteration solve). This
            # is the production pattern for repeated solves — and what
            # this chained-solve slope models.
            from kryst_tpu.solvers.ca_gmres import newton_shifts

            sh8 = jax.jit(newton_shifts, static_argnames=("side", "s"))(
                A8, b8, s=30
            )
            f_its = jax.jit(
                lambda A, bb, sh: ca_gmres(A, bb, tol=0.0, maxiter=60,
                                           restart=30, shifts=sh,
                                           )[1].iterations
            )
            its_ca = int(f_its(A8, b8, sh8))

            def mk_ca(nrep):
                def f_impl(A, bb, sh):
                    # A is the jit parameter (a tracer) — the scan body
                    # closes over IT, not the host array, so the operator
                    # rides the call as an argument (no HLO literal/413)
                    def step(carry, _):
                        x, _s = ca_gmres(A, carry, tol=0.0, maxiter=60,
                                         restart=30, shifts=sh)
                        return carry + 1e-6 * x, None

                    return jnp.sum(lax.scan(step, bb, None, length=nrep)[0])

                f = jax.jit(f_impl)
                return lambda: f(A8, b8, sh8)

            dt_solve = slope(mk_ca, 1, 3, reps=2)
            dt_ca = dt_solve / max(its_ca, 1)
            # per restart (s=m=30): ~4sn matvec+recurrence, 2sn equil,
            # (6s+4(m+1))n BCGS2, 4sn CholQR2, sn Z write, mn update
            est_ca = ((4 * 30 + 2 * 30 + 6 * 30 + 4 * 31 + 4 * 30 + 30 + 30)
                      * n8 * 4 / 30) / 650e9
            log(f"ca_gmres(30,s=30) 8M: {dt_ca*1e3:.2f} ms/iter "
                f"({its_ca} its/solve; traffic-bound ~{est_ca*1e3:.2f} ms)")
            emit("ca_gmres30_8M_per_iteration", dt_ca * 1e3, "ms",
                 est_ca / dt_ca)

            # config 4 at 8M: refined TRUE rtol <= 1e-8. coeff_dtype=bf16
            # halves the V-cycle's dominant coefficient stream on ALL
            # levels (6.24 -> 4.39 ms/V-cycle measured round 3); the
            # refinement wrapper keeps the TRUE residual honest (inner PC
            # precision only moves iteration counts), and host_rel is
            # verified below either way.
            t0 = time.time()
            # FULLY device-side setup: device-born L0 (stencil_to_dia,
            # zero host work) + device-probed Galerkin RAP for every
            # coarse level (pc/rap_probe.py — no host SpGEMM, no panel
            # uploads). Warm relies on the committed .jax_cache (probe
            # compiles are ~300 s cold).
            pc8 = GMGPC.setup(
                A8, grid=(200, 200, 200), nu_pre=2, nu_post=2,
                dtype=np.float32, smoother="chebyshev",
                coeff_dtype=jnp.bfloat16, rap="probe",
            )
            emit("gmg_8M_setup_wall", time.time() - t0, "s", None)
            log(f"GMG 8M setup (coeff bf16): {time.time()-t0:.0f}s")
            # warm re-setup: the first call pays one-time compiled-graph
            # loads; this is the repeated-use cost (0.77 s measured,
            # stage 13) — the number a long-lived solver service sees
            t0 = time.time()
            pc8 = GMGPC.setup(
                A8, grid=(200, 200, 200), nu_pre=2, nu_post=2,
                dtype=np.float32, smoother="chebyshev",
                coeff_dtype=jnp.bfloat16, rap="probe",
            )
            emit("gmg_8M_setup_wall_warm", time.time() - t0, "s", None)
            log(f"GMG 8M warm re-setup: {time.time()-t0:.2f}s")
            # device-built f64 twin: the OUTER residual uses the
            # panel-free const_spmv_xla form (no data_flat is even
            # allocated — stencil_to_dia skips it for const f64)
            A8_64 = stencil_to_dia(6.0, -1.0, -1.0, (200, 200, 200),
                                   dtype=np.float64)
            b8_64 = jnp.asarray(np.ones(n8))
            ref8 = jax.jit(
                lambda A64_, A_, M_, bb: refine_device(
                    A64_, bb,
                    lambda r: pcg(A_, r, M=M_, tol=1e-5, maxiter=60,
                                  true_residual=False),
                    tol=1e-8, max_outer=6,
                )
            )
            t8 = min_wall(
                lambda: sync(ref8(A8_64, A8, pc8, b8_64)[1].outer_iterations)
            )
            xr8, st8 = ref8(A8_64, A8, pc8, b8_64)
            a8_sp = sp.csr_matrix(
                (a8.data.astype(np.float64), a8.indices, a8.indptr), shape=a8.shape
            )
            host_rel8 = float(
                np.linalg.norm(np.asarray(b8_64) - a8_sp @ np.asarray(xr8))
                / np.linalg.norm(np.asarray(b8_64))
            )
            log(f"config4 8M refined TRUE<=1e-8: {t8*1e3:.0f} ms (host_rel {host_rel8:.2e})")
            if host_rel8 <= 1e-8:
                emit("config4_poisson3d_8M_refined_TRUE_rtol1e-8", t8, "s",
                     8.0 / t8)  # 1 s/1M target scaled by 8

            # RTT-free per-solve slope, same methodology as the 1M
            # metric: the one-call wall above carries a full relay round
            # trip (~15% at 8M and drifting between sessions)
            try:
                def mk_ref8(nrep):
                    def f_impl(A64_, bb, ops_):
                        def step(carry, _):
                            x, st = refine_device(
                                A64_, carry,
                                lambda r: pcg(ops_[0], r, M=ops_[1],
                                              tol=1e-5, maxiter=60,
                                              true_residual=False),
                                tol=1e-8, max_outer=6,
                            )
                            return carry + 1e-6 * x, st.outer_iterations

                        return jnp.sum(
                            lax.scan(step, bb, None, length=nrep)[1]
                        )

                    f = jax.jit(f_impl)
                    return lambda: sync(f(A8_64, b8_64, (A8, pc8)))

                r1, r3 = mk_ref8(1), mk_ref8(3)
                r1(); r3()
                t1 = min(min_wall(r1), min_wall(r1))
                t3 = min_wall(r3)
                dt8 = (t3 - t1) / 2
                log(f"refined[gmg] 8M per-solve slope: {dt8*1e3:.1f} ms")
                emit("poisson3d_8M_refined_per_solve_slope", dt8 * 1e3,
                     "ms", 8.0 / dt8)
            except Exception as e:
                log(f"8M refined slope failed: {type(e).__name__}: {e}")
        except Exception as e:
            log(f"8M configs failed: {type(e).__name__}: {e}")

    # ------------- config 5: sharded solvers (1-device degenerate) -----
    try:
        from kryst_tpu.parallel.mesh import solver_mesh
        from kryst_tpu.parallel.sharded import (
            distribute_dia, pad_vector, sharded_solve,
        )
        from kryst_tpu.solvers.pipelined import pipecg

        # convergence/parity metric, not a speed one: f64 keeps tol=1e-6
        # honestly reachable (the f32 floor at 64^2 is ~eps*kappa ~ 2e-4)
        mesh5 = solver_mesh(len(jax.devices()))
        a5 = gallery.poisson_2d(64)
        A5 = csr_to_dia(a5, dtype=np.float64)
        A5d, npad5 = distribute_dia(A5, mesh5)
        b5 = pad_vector(jnp.ones(64 * 64, jnp.float64), npad5, mesh5)
        x5, s5 = sharded_solve(pipecg, A5d, b5, mesh=mesh5, tol=1e-6,
                               maxiter=500)
        log(
            f"config5: sharded pipecg over {len(jax.devices())} device(s): "
            f"iters={int(s5.iterations)} reached={bool(s5.reached_tol)}"
        )
        emit("config5_sharded_pipecg_iters", int(s5.iterations), "iterations",
             1.0 if bool(s5.reached_tol) else 0.0)

        # the BASELINE config-5 pairing also names CA-GMRES + Additive
        # Schwarz: run it sharded (shard-local Schwarz blocks, 4 Gram
        # psums per s matvecs)
        from kryst_tpu.parallel.sharded import shard_schwarz
        from kryst_tpu.solvers.ca_gmres import ca_gmres as _ca

        M5 = shard_schwarz(A5d, degree=4)
        x5c, s5c = sharded_solve(
            _ca, A5d, b5, mesh=mesh5, M=M5, tol=1e-6, maxiter=600,
            restart=20,
        )
        log(
            f"config5: sharded ca_gmres+shard-ASM: iters={int(s5c.iterations)} "
            f"reached={bool(s5c.reached_tol)}"
        )
        emit("config5_sharded_ca_gmres_asm_iters", int(s5c.iterations),
             "iterations", 1.0 if bool(s5c.reached_tol) else 0.0)
    except Exception as e:
        log(f"config5 failed: {type(e).__name__}: {e}")

    # ------------- headline LAST: config 4 at 1M ------------------------
    if t_refined is not None:
        emit(f"poisson3d_{size_tag}_refined_TRUE_rtol1e-8", t_refined, "s",
             1.0 / t_refined)
    else:
        # fallback: converged f32 PCG wall (honest floor)
        solve = jax.jit(lambda A, b, M: pcg(A, b, M=M, tol=1e-8, maxiter=3000))
        t_solve = min_wall(lambda: sync(solve(A, b, M)[1].iterations))
        emit(f"poisson3d_{size_tag}_pcg_jacobi_time_f32floor", t_solve, "s",
             1.0 / t_solve)

    if _METRIC_SUFFIX:
        # relay wedged: replay the committed chip record so the driver
        # snapshot still carries dated TPU evidence (VERDICT r4 item 2)
        replay_chip_records(headline_metric="refined_TRUE_rtol1e-8")


if __name__ == "__main__":
    main()
