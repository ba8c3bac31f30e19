"""Round-5 stage 10c: FEM 1M cell matvec R sweep. The (R=1024, W=128)
beyond-VMEM default degenerates on mesh matrices: cells are tiny (P=4),
K explodes (4626 records/block), the one-hot row einsum costs
padded*R flops, and the VMEM budget forces BB=1 -> 977 sequential
batches (136-141 ms measured, stages 10/10b). Small R cuts both
factors.

Run: nohup python tools/tpu_r5_stage10c.py > /tmp/r5_stage10c.log 2>&1 &
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kryst_tpu.matrix import gallery  # noqa: E402
from kryst_tpu.pc.amg import _to_scipy  # noqa: E402
from kryst_tpu.utils.chiprecord import append_chip_record  # noqa: E402


def rec(metric, value, unit, vs=None):
    print(f"RESULT {metric}: {value:.4f} {unit}", flush=True)
    append_chip_record(metric, value, unit, vs, source="tpu_r5_stage10c")


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
    t0 = time.time()
    A = _to_scipy(gallery.fem_poisson_2d(1_000_000, shift=1.0))
    print(f"fem assembly {time.time()-t0:.1f}s nnz={A.nnz}", flush=True)
    from kryst_tpu.ops.cellspmv import scipy_to_cells

    n = A.shape[0]
    x0 = jnp.asarray(
        np.random.default_rng(3).standard_normal(n).astype(np.float32)
    )
    yr = A @ np.asarray(x0)

    for R, W in ((128, 128), (256, 128), (512, 128), (64, 128),
                 (128, 256), (8, 128)):
        try:
            cop = scipy_to_cells(
                A, dtype=np.float32, R=R, W=W, transpose="never",
                max_pad_ratio=16.0,
            )
        except ValueError as e:
            print(f"R={R} W={W}: plan declined: {e}", flush=True)
            continue
        NB, K, P = cop.rec_shape
        print(f"R={R} W={W}: rec=({NB},{K},{P}) padded={NB*K*P} BB={cop.BB} "
              f"nbatch={-(-NB // cop.BB)}", flush=True)
        f = jax.jit(
            lambda it, v, Aa: jnp.sum(
                lax.fori_loop(
                    0, it, lambda i, u: Aa.matvec(u) * 1e-3 + u * 0.5, v
                )
            )
        )
        try:
            dt = slope(lambda it: float(f(it, x0, cop)), 4, 16)
        except Exception as e:
            print(f"  timing failed: {type(e).__name__}: {e}", flush=True)
            continue
        y = np.asarray(jax.jit(lambda Aa, v: Aa.matvec(v))(cop, x0))
        err = float(np.max(np.abs(y - yr)) / np.max(np.abs(yr)))
        rec(f"fem1M_cells_matvec_R{R}_W{W}", dt * 1e3, "ms",
            131.0 / (dt * 1e3))
        print(f"  rel err vs scipy: {err:.3e}", flush=True)
        del cop


if __name__ == "__main__":
    main()
