"""Round-5 stage 10b: FEM 1M cell matvec with FLAT record streams
(3-D (NB, K, P) records tile-pad P -> 128 lanes; flat 1-D leaves read
dense). Compare vs stage 10's 136.8 ms (int8, 3-D) and round-4's 131 ms
(int32, 3-D).

Run: nohup python tools/tpu_r5_stage10b.py > /tmp/r5_stage10b.log 2>&1 &
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
    append_chip_record(metric, value, unit, vs, source="tpu_r5_stage10b")


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
    from kryst_tpu.ops.cellspmv import cells_if_faster

    cop = cells_if_faster(
        A, ell_width=int(np.diff(A.indptr).max()), dtype=np.float32,
        transpose="never",
    )
    assert cop is not None
    NB, K, P = cop.rec_shape
    padded = NB * K * P
    print(f"rec_shape=({NB},{K},{P}) padded={padded} "
          f"pad_ratio={padded/A.nnz:.2f} "
          f"bytes/entry={(cop.lrow.dtype.itemsize + cop.lcol.dtype.itemsize + 4)}",
          flush=True)
    n = A.shape[0]
    x0 = jnp.asarray(
        np.random.default_rng(3).standard_normal(n).astype(np.float32)
    )
    f = jax.jit(
        lambda it, v, Aa: jnp.sum(
            lax.fori_loop(
                0, it, lambda i, u: Aa.matvec(u) * 1e-3 + u * 0.5, v
            )
        )
    )
    dt = slope(lambda it: float(f(it, x0, cop)), 4, 16)
    rec("fem1M_cells_matvec_flatrec", dt * 1e3, "ms", 131.0 / (dt * 1e3))
    # traffic bound for the flat stream
    bpe = cop.lrow.dtype.itemsize + cop.lcol.dtype.itemsize + 4
    print(f"  flat-stream bound ~{padded * bpe / 650e9 * 1e3:.2f} ms",
          flush=True)

    # correctness on chip vs scipy
    y = np.asarray(jax.jit(lambda Aa, v: Aa.matvec(v))(cop, x0))
    yr = A @ np.asarray(x0)
    print(f"  max err vs scipy: {np.max(np.abs(y - yr)):.3e}", flush=True)


if __name__ == "__main__":
    main()
