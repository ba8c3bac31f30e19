"""Round-5 stage 10: (a) unstructured 1M L0 matvec with int8/int16 cell
records (VERDICT item 6 — was 131 ms FEM cells / 55 ms expander ELL);
(b) block-interleaved matvec at 8M k=8 with a block_rows sweep
(VERDICT item 7 — 2.48 ms vs the 1.75 ms bound at bm=1024).

Run: nohup python tools/tpu_r5_stage10.py > /tmp/r5_stage10.log 2>&1 &
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kryst_tpu.matrix import gallery  # noqa: E402
from kryst_tpu.utils.chiprecord import append_chip_record  # noqa: E402


def rec(metric, value, unit, vs=None):
    print(f"RESULT {metric}: {value:.4f} {unit}", flush=True)
    append_chip_record(metric, value, unit, vs, source="tpu_r5_stage10")


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


def mv_slope(op, n, lo=4, hi=16):
    x0 = jnp.asarray(
        np.random.default_rng(3).standard_normal(n).astype(np.float32)
    )
    f = jax.jit(
        lambda it, v, A: jnp.sum(
            lax.fori_loop(
                0, it, lambda i, u: A.matvec(u) * 1e-3 + u * 0.5, v
            )
        )
    )
    return slope(lambda it: float(f(it, x0, op)), lo, hi)


def main():
    print(f"devices: {jax.devices()}", flush=True)

    from kryst_tpu.pc.amg import _to_scipy

    # ---- (a) FEM 1M cells (int8 records) --------------------------------
    t0 = time.time()
    A = _to_scipy(gallery.fem_poisson_2d(1_000_000, shift=1.0))
    print(f"fem assembly {time.time()-t0:.1f}s nnz={A.nnz}", flush=True)
    from kryst_tpu.ops.cellspmv import cells_if_faster

    t0 = time.time()
    cop = cells_if_faster(
        A, ell_width=int(np.diff(A.indptr).max()), dtype=np.float32,
        transpose="never",
    )
    print(f"cells plan {time.time()-t0:.1f}s pad={cop is not None and 'ok'}",
          flush=True)
    if cop is not None:
        print(f"  lrow dtype {cop.lrow.dtype}, lcol {cop.lcol.dtype}",
              flush=True)
        dt = mv_slope(cop, A.shape[0])
        rec("fem1M_cells_matvec_int8idx", dt * 1e3, "ms", 131.0 / (dt * 1e3))

    # ---- (b) expander 1M ELL control ------------------------------------
    t0 = time.time()
    E = _to_scipy(gallery.expander_laplacian(1_000_000, degree=6, seed=0))
    print(f"expander assembly {time.time()-t0:.1f}s nnz={E.nnz}", flush=True)
    from kryst_tpu.matrix.formats import scipy_to_ell

    ell = scipy_to_ell(E, np.float32)
    dt = mv_slope(ell, E.shape[0])
    rec("expander1M_ell_matvec", dt * 1e3, "ms", 55.0 / (dt * 1e3))
    # gather floor: nnz * 7.7 ns
    print(f"  gather floor ~{E.nnz * 7.7e-9 * 1e3:.1f} ms for nnz={E.nnz}",
          flush=True)

    # ---- (c) 8M block-inter matvec, bm sweep -----------------------------
    from kryst_tpu import native
    from kryst_tpu.ops.streamed import (
        dia_spmv_planned_inter, interleave_cols, plan_dia,
    )

    n3 = 200
    n8 = n3 ** 3
    t0 = time.time()
    a8 = gallery.poisson_3d(n3)
    offs64, panel = native.csr_to_dia_fill(
        a8.indptr, a8.indices, a8.data, n8, 32, np.float32
    )
    offsets = tuple(int(o) for o in offs64)
    print(f"8M assembly+panel {time.time()-t0:.1f}s offsets={offsets}",
          flush=True)
    k = 8
    Xk = np.random.default_rng(7).standard_normal((k, n8)).astype(np.float32)
    for bm in (1024, 2048, 512):
        dblk_np, plan = plan_dia(
            panel, offsets, block_rows=bm, blk_dtype=jnp.bfloat16
        )
        if plan.margin > plan.block_rows:
            print(f"bm={bm}: margin {plan.margin} > bm — skip", flush=True)
            continue
        dblk = jnp.asarray(dblk_np)
        Xi = interleave_cols(jnp.asarray(Xk), plan)
        f = jax.jit(
            lambda it, Xi_, D, plan=plan: jnp.sum(
                lax.fori_loop(
                    0, it,
                    lambda i, u: dia_spmv_planned_inter(
                        D, offsets, u, plan, k
                    ) * 1e-3 + u * 0.5,
                    Xi_,
                )
            )
        )
        dt = slope(lambda it: float(f(it, Xi, dblk)), 4, 16)
        rec(f"block_inter_matvec_8M_k8_bm{plan.block_rows}", dt * 1e3, "ms",
            1.75 / (dt * 1e3))
        del dblk, Xi


if __name__ == "__main__":
    main()
