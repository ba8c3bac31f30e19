"""Round-5 stage 1: bisect the resident-PCG regression (VERDICT r4 weak #1).

Judge's fresh run: PCG+Jacobi at 1M dof = 191.9 us/iter by the
RTT-cancelling slope, vs BENCH_r02's 23.8 us — same pcg code (git diff
of cg.py since round 2 is two as_operator dtype args). The measurement
HARNESS changed: round-2 bench CLOSED OVER A and M in the jit (panels
become HLO constants), round-4 bench passes them as jit ARGUMENTS (the
HTTP-413 fix: entry parameters live in HBM). Hypothesis: parameters are
re-streamed from HBM every iteration while constants get VMEM-pinned.

Interleaved same-process measurements, slope-timed:
  1. matvec loop, A closed over           (round-2 form)
  2. matvec loop, A as argument
  3. pcg, A/M closed over, b argument     (round-2 bench form)
  4. pcg, A/b/M arguments, dynamic it     (round-4 bench form)
  5. pcg, A/b/M arguments, static maxiter (judge's exact form)
  6. pcg args + barrier-copy pin of A.data/M.inv_diag inside jit
  7. pcg args, M=None
  8. bare handwritten CG loop, args

Run: nohup python tools/tpu_r5_stage1.py > /tmp/r5_stage1.log 2>&1 &
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kryst_tpu import JacobiPC, pcg  # noqa: E402
from kryst_tpu.matrix import gallery  # noqa: E402
from kryst_tpu.ops.dia import csr_to_dia  # noqa: E402

RESULTS = {}


def emit(name, us):
    RESULTS[name] = us
    print(f"RESULT {name}: {us:.2f} us/iter", flush=True)


def timeit(f, reps=3):
    best = 1e9
    for _ in range(reps):
        t = time.time()
        f()
        best = min(best, time.time() - t)
    return best


def slope(run, lo, hi, reps=3):
    """run(it) must block on a device scalar."""
    run(lo)  # warm/compile
    run(hi)
    t_lo = timeit(lambda: run(lo), reps)
    t_hi = timeit(lambda: run(hi), reps)
    return (t_hi - t_lo) / (hi - lo) * 1e6  # us/iter


def pin(tree):
    """Copy float leaves through an opt-barrier add so XLA sees temps,
    not entry parameters (parameters may be pinned to HBM; temps are
    MSA-eligible for VMEM)."""
    def cp(x):
        if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating):
            return x + lax.optimization_barrier(jnp.zeros((), x.dtype))
        return x
    return jax.tree_util.tree_map(cp, tree)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    n3 = 100
    n = n3 ** 3
    t0 = time.time()
    a = gallery.poisson_3d(n3)
    A = csr_to_dia(a, dtype=np.float32)
    b = jnp.ones(n, dtype=jnp.float32)
    M = JacobiPC.setup(A)
    x0 = jnp.asarray(
        np.random.default_rng(3).standard_normal(n).astype(np.float32)
    )
    print(f"setup {time.time()-t0:.1f}s  offsets={A.offsets} "
          f"resident={A._resident()} data_blk={A.data_blk is not None}",
          flush=True)

    # --- 1. matvec loop, closure ---------------------------------------
    f1 = jax.jit(
        lambda it, v: jnp.sum(
            lax.fori_loop(0, it, lambda i, u: A.matvec(u) / 6.0, v)
        )
    )
    emit("matvec_closure", slope(lambda it: float(f1(it, x0)), 100, 700))

    # --- 2. matvec loop, A as argument ----------------------------------
    f2 = jax.jit(
        lambda it, v, Aa: jnp.sum(
            lax.fori_loop(0, it, lambda i, u: Aa.matvec(u) / 6.0, v)
        )
    )
    emit("matvec_args", slope(lambda it: float(f2(it, x0, A)), 100, 700))

    # --- 2b. matvec loop, arg + pin -------------------------------------
    def mv_pin(it, v, Aa):
        Aa = pin(Aa)
        return jnp.sum(lax.fori_loop(0, it, lambda i, u: Aa.matvec(u) / 6.0, v))
    f2b = jax.jit(mv_pin)
    emit("matvec_args_pinned", slope(lambda it: float(f2b(it, x0, A)), 100, 700))

    # --- 3. pcg, closure (round-2 bench form) ---------------------------
    f3 = jax.jit(
        lambda it, bb: pcg(
            A, bb, M=M, tol=0.0, maxiter=it, true_residual=False
        )[1].iterations
    )
    emit("pcg_closure", slope(lambda it: float(f3(it, b)), 200, 1400))

    # --- 4. pcg, args, dynamic it (round-4 bench form, dyn maxiter) -----
    f4 = jax.jit(
        lambda it, Aa, bb, Mm: pcg(
            Aa, bb, M=Mm, tol=0.0, maxiter=it, true_residual=False
        )[1].iterations
    )
    emit("pcg_args", slope(lambda it: float(f4(it, A, b, M)), 200, 1400))

    # --- 5. pcg, args, STATIC maxiter (judge's exact form) --------------
    fs = {}
    for it in (200, 1400):
        fs[it] = jax.jit(
            lambda Aa, bb, Mm, it=it: pcg(
                Aa, bb, M=Mm, tol=0.0, maxiter=it, true_residual=False
            )[1].iterations
        )
    emit("pcg_args_static", slope(lambda it: float(fs[it](A, b, M)), 200, 1400))

    # --- 6. pcg, args + pin ---------------------------------------------
    def pcg_pin(it, Aa, bb, Mm):
        Aa = pin(Aa)
        Mm = pin(Mm)
        return pcg(Aa, bb, M=Mm, tol=0.0, maxiter=it,
                   true_residual=False)[1].iterations
    f6 = jax.jit(pcg_pin)
    emit("pcg_args_pinned", slope(lambda it: float(f6(it, A, b, M)), 200, 1400))

    # --- 7. pcg, args, M=None -------------------------------------------
    f7 = jax.jit(
        lambda it, Aa, bb: pcg(
            Aa, bb, tol=0.0, maxiter=it, true_residual=False
        )[1].iterations
    )
    emit("pcg_noM_args", slope(lambda it: float(f7(it, A, b)), 200, 1400))

    # --- 8. bare handwritten CG loop, args -------------------------------
    def bare(it, Aa, bb, dinv):
        x = jnp.zeros_like(bb)
        r = bb
        z = dinv * r
        p = z
        rz = jnp.vdot(r, z)

        def body(i, s):
            x, r, z, p, rz = s
            ap, pap = Aa.matvec_dot(p)
            alpha = rz / pap
            x = x + alpha * p
            r = r - alpha * ap
            z = dinv * r
            rz_new = jnp.vdot(r, z)
            p = z + (rz_new / rz) * p
            return (x, r, z, p, rz_new)

        out = lax.fori_loop(0, it, body, (x, r, z, p, rz))
        return jnp.sum(out[0])

    f8 = jax.jit(bare)
    emit("bare_cg_args",
         slope(lambda it: float(f8(it, A, b, M.inv_diag)), 200, 1400))

    # --- 8b. bare loop, closure ------------------------------------------
    dinv = M.inv_diag
    f8b = jax.jit(lambda it, bb: bare(it, A, bb, dinv))
    emit("bare_cg_closure", slope(lambda it: float(f8b(it, b)), 200, 1400))

    print("SUMMARY " + json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
