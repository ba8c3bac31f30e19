"""Round-5 stage 10d: cell matvec one-hot CONTRACTION form sweep at
(R=128, W=128) on the FEM 1M operator. The einsum form lowers to 16k+
tiny batched matmuls per batch step; a broadcast multiply-reduce keeps
the one-hot on the VPU inside one fusion. Also tries P=8/16 (fewer,
fatter records).

Run: nohup python tools/tpu_r5_stage10d.py > /tmp/r5_stage10d.log 2>&1 &
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
    append_chip_record(metric, value, unit, vs, source="tpu_r5_stage10d")


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


def matvec_vpu(op, x):
    """CellOperator.matvec with multiply-reduce one-hots (VPU) instead
    of einsum (batched tiny matmuls). Same arithmetic."""
    m, n = op.shape
    NB, K, P = op.rec_shape
    R, W, BB = op.R, op.W, op.BB
    NC = -(-n // W)
    acc = jnp.promote_types(op.val.dtype, x.dtype)
    x_pad = jnp.zeros(NC * W, acc).at[:n].set(x.astype(acc))
    x2d = x_pad.reshape(NC, W)
    iw = jnp.arange(W, dtype=op.lcol.dtype)
    ir = jnp.arange(R, dtype=op.lrow.dtype)
    nbatch = -(-NB // BB)
    y2d0 = jnp.zeros((nbatch * BB, R), acc)

    def body(b, y2d):
        off = b * BB
        lrow = lax.dynamic_slice_in_dim(
            op.lrow, off * K * P, BB * K * P, 0).reshape(BB, K, P)
        lcol = lax.dynamic_slice_in_dim(
            op.lcol, off * K * P, BB * K * P, 0).reshape(BB, K, P)
        val = lax.dynamic_slice_in_dim(
            op.val, off * K * P, BB * K * P, 0).reshape(BB, K, P)
        chk = lax.dynamic_slice_in_dim(
            op.chk, off * K, BB * K, 0).reshape(BB, K)
        g = x2d[chk]  # (BB, K, W)
        gv = jnp.sum(
            (lcol[..., None] == iw).astype(acc) * g[:, :, None, :], axis=-1
        ) * val.astype(acc)  # (BB, K, P)
        yb = jnp.sum(
            (lrow[..., None] == ir).astype(acc) * gv[..., None], axis=(1, 2)
        )  # (BB, R)
        return lax.dynamic_update_slice(y2d, yb, (off, 0))

    y2d = lax.fori_loop(0, nbatch, body, y2d0)
    return y2d.reshape(-1)[:m].astype(x.dtype)


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

    for label, kw in (
        ("vpu_R128_P4", dict(R=128, W=128)),
        ("vpu_R128_P8", dict(R=128, W=128, P=8)),
        ("vpu_R128_P16", dict(R=128, W=128, P=16)),
    ):
        try:
            cop = scipy_to_cells(
                A, dtype=np.float32, transpose="never", max_pad_ratio=24.0,
                **kw,
            )
        except ValueError as e:
            print(f"{label}: plan declined: {e}", flush=True)
            continue
        NB, K, P = cop.rec_shape
        print(f"{label}: rec=({NB},{K},{P}) padded={NB*K*P} BB={cop.BB} "
              f"nbatch={-(-NB // cop.BB)}", flush=True)
        f = jax.jit(
            lambda it, v, Aa: jnp.sum(
                lax.fori_loop(
                    0, it,
                    lambda i, u: matvec_vpu(Aa, u) * 1e-3 + u * 0.5, v
                )
            )
        )
        try:
            dt = slope(lambda it: float(f(it, x0, cop)), 4, 16)
        except Exception as e:
            print(f"  timing failed: {type(e).__name__}: {e}", flush=True)
            continue
        y = np.asarray(jax.jit(lambda Aa, v: matvec_vpu(Aa, v))(cop, x0))
        err = float(np.max(np.abs(y - yr)) / np.max(np.abs(yr)))
        rec(f"fem1M_cells_matvec_{label}", dt * 1e3, "ms", 131.0 / (dt * 1e3))
        print(f"  rel err vs scipy: {err:.3e}", flush=True)
        del cop


if __name__ == "__main__":
    main()
