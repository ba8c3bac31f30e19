"""Round-5 stage 2: why do jit-argument operators run 12x slower in loops?

Stage 1 showed: matvec loop with A closed over = 25 us/iter; A as a jit
argument = 321 us/iter (1M dof, 7-diagonal DIA, resident). Dump the
optimized HLO of both forms and diff the while-loop bodies; then try
carry/barrier restructurings that might stop the per-iteration copy.

Run: nohup python tools/tpu_r5_stage2.py > /tmp/r5_stage2.log 2>&1 &
"""
import re
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kryst_tpu.matrix import gallery  # noqa: E402
from kryst_tpu.ops.dia import csr_to_dia  # noqa: E402


def summarize(label, txt):
    print(f"===== {label}: {len(txt)} chars", flush=True)
    # count copies / fusions touching the 7x1M panel inside while bodies
    for pat in (r"copy[^\n]*f32\[7,1000000\]", r"f32\[7,1000000\][^\n]*copy",
                r"while[^\n]*", r"copy-start", r"copy-done"):
        hits = re.findall(pat, txt)
        print(f"  /{pat}/: {len(hits)}", flush=True)
        for h in hits[:4]:
            print(f"    {h[:160]}", flush=True)
    # dump any line mentioning both 'copy' and the panel shape
    lines = [l for l in txt.splitlines() if "copy" in l and "7,1000000" in l]
    print(f"  copy-lines touching panel: {len(lines)}", flush=True)
    for l in lines[:8]:
        print("   ", l.strip()[:200], flush=True)


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
    return (t_hi - t_lo) / (hi - lo) * 1e6


def main():
    print(f"devices: {jax.devices()}", flush=True)
    n3 = 100
    n = n3 ** 3
    a = gallery.poisson_3d(n3)
    A = csr_to_dia(a, dtype=np.float32)
    x0 = jnp.asarray(
        np.random.default_rng(3).standard_normal(n).astype(np.float32)
    )

    # --- HLO: closure form ----------------------------------------------
    f1 = jax.jit(
        lambda it, v: jnp.sum(
            lax.fori_loop(0, it, lambda i, u: A.matvec(u) / 6.0, v)
        )
    )
    try:
        txt = f1.lower(700, x0).compile().as_text()
        summarize("closure", txt)
    except Exception as e:
        print(f"closure HLO failed: {type(e).__name__}: {e}", flush=True)

    # --- HLO: args form ---------------------------------------------------
    f2 = jax.jit(
        lambda it, v, Aa: jnp.sum(
            lax.fori_loop(0, it, lambda i, u: Aa.matvec(u) / 6.0, v)
        )
    )
    try:
        txt = f2.lower(700, x0, A).compile().as_text()
        summarize("args", txt)
    except Exception as e:
        print(f"args HLO failed: {type(e).__name__}: {e}", flush=True)

    # --- experiment: data rides the carry, barrier defeats invariant
    #     hoisting / carry simplification --------------------------------
    def mv_carry(it, v, data, offsets):
        def body(i, s):
            u, d = s
            d = lax.optimization_barrier(d)
            from kryst_tpu.ops.dia import dia_spmv_xla

            return (dia_spmv_xla(d, offsets, u) / 6.0, d)

        out = lax.fori_loop(0, it, body, (v, data))
        return jnp.sum(out[0])

    f3 = jax.jit(mv_carry, static_argnums=(3,))
    r = slope(lambda it: float(f3(it, x0, A.data, A.offsets)), 100, 700)
    print(f"RESULT matvec_carry_barrier: {r:.2f} us/iter", flush=True)
    try:
        txt = f3.lower(700, x0, A.data, A.offsets).compile().as_text()
        summarize("carry_barrier", txt)
    except Exception as e:
        print(f"carry HLO failed: {type(e).__name__}: {e}", flush=True)

    # --- experiment: barrier INSIDE body, data free (not explicit carry)
    def mv_bar(it, v, data, offsets):
        def body(i, u):
            d = lax.optimization_barrier(data)
            from kryst_tpu.ops.dia import dia_spmv_xla

            return dia_spmv_xla(d, offsets, u) / 6.0

        return jnp.sum(lax.fori_loop(0, it, body, v))

    f4 = jax.jit(mv_bar, static_argnums=(3,))
    r = slope(lambda it: float(f4(it, x0, A.data, A.offsets)), 100, 700)
    print(f"RESULT matvec_bodybar: {r:.2f} us/iter", flush=True)

    # --- control: args form re-measured this process ---------------------
    r = slope(lambda it: float(f2(it, x0, A)), 100, 700)
    print(f"RESULT matvec_args_ctl: {r:.2f} us/iter", flush=True)

    # --- control: closure re-measured -------------------------------------
    r = slope(lambda it: float(f1(it, x0)), 100, 700)
    print(f"RESULT matvec_closure_ctl: {r:.2f} us/iter", flush=True)


if __name__ == "__main__":
    main()
