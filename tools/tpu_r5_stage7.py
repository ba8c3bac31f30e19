"""Round-5 stage 7: exact diag-major ILU apply cost decomposition
(VERDICT r4 weak #4: 338.6 us/iter exact vs 36.5 approximate at 256^2).

Hypothesis: the apply is at (or near) the wavefront DISPATCH-LATENCY
floor — 2 factors x 511 dependent antidiagonal substeps, each a ~6-op
fused elementwise chain on a (256,) vector, at ~0.25-0.5 us per
dependent fusion. Nothing traffic-bound: all buffers are ~1.5 MB.

Measured here, interleaved:
  1. ilu.apply slope at _UNROLL=16 (status quo)
  2. pure dependency-chain floor: 1022 dependent 1-op fusions (256,)
  3. scan-vs-static-unroll: solve_packed variant with a Python loop +
     one stack (kills the per-step stacked-output copy, round-4 lesson)
  4. _UNROLL=32 variant of the static-unroll form
  5. full GMRES iteration with the exact PC (the VERDICT metric)

Run: nohup python tools/tpu_r5_stage7.py > /tmp/r5_stage7.log 2>&1 &
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kryst_tpu.matrix import gallery  # noqa: E402
from kryst_tpu.pc.diagmajor import (  # noqa: E402
    DiagMajorILU2D, skew_pack, skew_unpack,
)
from kryst_tpu.utils.chiprecord import append_chip_record  # noqa: E402


def rec(metric, value, unit, vs=None):
    print(f"RESULT {metric}: {value:.3f} {unit}", flush=True)
    append_chip_record(metric, value, unit, vs, source="tpu_r5_stage7")


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


def solve_packed_unrolled(T, B):
    """DiagMajorTriangular2D.solve_packed with the lax.scan replaced by
    a STATIC Python loop + one jnp.stack at the end — identical
    arithmetic and order, no scan machinery, no per-step stacked-output
    buffer pass (round-4 lesson: scan ys pay a full output-buffer copy
    per step on this backend)."""
    nx = T.grid[0]
    zero = jnp.zeros((1,), dtype=B.dtype)
    nlev = B.shape[0]
    K = T.c_ax.shape[1]
    nsteps = T.c_ax.shape[0]
    pad = nsteps * K - nlev
    Bb = jnp.pad(B, ((0, pad), (0, 0))).reshape(nsteps, K, -1)
    order = range(K) if T.lower else range(K - 1, -1, -1)
    steps = range(nsteps) if T.lower else range(nsteps - 1, -1, -1)

    if T.lower:
        def substep(x, b, ca, cu, di):
            x_ax = jnp.concatenate([zero, x[:-1]])
            return (b - ca * x_ax - cu * x) * di
    else:
        def substep(x, b, ca, cu, di):
            x_ax = jnp.concatenate([x[1:], zero])
            return (b - ca * x_ax - cu * x) * di

    x = jnp.zeros((nx,), dtype=B.dtype)
    out = [None] * nsteps
    for si in steps:
        rows = [None] * K
        for k in order:
            x = substep(x, Bb[si, k], T.c_ax[si, k], T.c_un[si, k],
                        T.dinv[si, k])
            rows[k] = x
        out[si] = jnp.stack(rows)
    X = jnp.stack(out)
    return X.reshape(nsteps * K, -1)[:nlev]


def main():
    print(f"devices: {jax.devices()}", flush=True)
    nx = ny = 256
    n = nx * ny
    a = gallery.convection_diffusion_2d(nx)
    ilu = DiagMajorILU2D.setup(a, (nx, ny), dtype=np.float32)
    r0 = jnp.asarray(
        np.random.default_rng(0).standard_normal(n).astype(np.float32)
    )

    # 0. sanity: unrolled == scan (bitwise)
    B = skew_pack(r0.reshape(nx, ny))
    y_scan = ilu.L.solve_packed(B)
    y_unr = solve_packed_unrolled(ilu.L, B)
    print(f"unrolled == scan: {bool(jnp.all(y_scan == y_unr))}", flush=True)

    # 1. status-quo apply slope
    f1 = jax.jit(
        lambda it, pc_, v: jnp.sum(
            lax.fori_loop(
                0, it, lambda i, u: pc_.apply(u) / 2.0 + 1e-6, v
            )
        )
    )
    dt1 = slope(lambda it: float(f1(it, ilu, r0)), 20, 120)
    rec("ilu_exact_apply_256sq_scan_K16", dt1 * 1e6, "us")

    # 2. pure dependency-chain floor: 1022 dependent 1-op fusions
    def chain(it, v):
        def body(i, u):
            x = u
            for _ in range(1022):
                x = x * 0.999999 + 1e-9
            return x
        return jnp.sum(lax.fori_loop(0, it, body, v))

    f2 = jax.jit(chain)
    v256 = jnp.ones((256,), jnp.float32)
    dt2 = slope(lambda it: float(f2(it, v256)), 5, 30)
    rec("chain_1022_dependent_ops_256", dt2 * 1e6, "us")

    # 3. static-unroll apply slope
    def apply_unrolled(pc_, r):
        B = skew_pack(r.reshape(nx, ny))
        Y = solve_packed_unrolled(pc_.L, B)
        X = solve_packed_unrolled(pc_.U, Y)
        return skew_unpack(X, nx, ny).reshape(nx * ny)

    f3 = jax.jit(
        lambda it, pc_, v: jnp.sum(
            lax.fori_loop(
                0, it, lambda i, u: apply_unrolled(pc_, u) / 2.0 + 1e-6, v
            )
        )
    )
    dt3 = slope(lambda it: float(f3(it, ilu, r0)), 20, 120)
    rec("ilu_exact_apply_256sq_unrolled_K16", dt3 * 1e6, "us")

    # 4. GMRES iteration with the exact PC (the VERDICT metric)
    from kryst_tpu.solvers.gmres import gmres
    from kryst_tpu.ops.dia import csr_to_dia

    A = csr_to_dia(a, dtype=np.float32)
    b = jnp.ones(n, jnp.float32)
    fs = {}
    for it in (60, 560):
        fs[it] = jax.jit(
            lambda Aa, bb, Mm, it=it: gmres(
                Aa, bb, M=Mm, side="right", tol=0.0, maxiter=it, restart=30,
            )[1].iterations
        )
    dt4 = slope(lambda it: float(fs[it](A, b, ilu)), 60, 560)
    rec("gmres_ilu_exact_256sq_per_iteration", dt4 * 1e6, "us",
        36.5 / (dt4 * 1e6))


if __name__ == "__main__":
    main()
