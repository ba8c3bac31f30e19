"""Round-5 stage 3: validate the flat-panel fix for the args regression.

Stage 2 HLO: a (7, 1M) f32 panel passed as a jit argument gets layout
T(8,128); slicing one diagonal (a row) reads 8x its bytes (one useful
sublane per tile). Candidates measured here, all ARGS-form loops:

  1. data as 7 separate 1-D arguments (tuple leaf)
  2. data as ONE flat (7M,) argument, static per-diag slices
  3. bare CG loop on the flat form + jacobi, the pcg shape
  4. controls: 2-D arg form, closure form

Run: nohup python tools/tpu_r5_stage3.py > /tmp/r5_stage3.log 2>&1 &
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kryst_tpu.matrix import gallery  # noqa: E402
from kryst_tpu.ops.dia import csr_to_dia, dia_spmv_xla  # noqa: E402


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


def spmv_rows(rows, offsets, x):
    """DIA SpMV from per-diagonal 1-D coefficient arrays (same arithmetic
    as dia_spmv_xla: y += d * shift(x, off) with zero fill)."""
    n = x.shape[0]
    y = jnp.zeros_like(x)
    for d, off in zip(rows, offsets):
        if off == 0:
            y = y + d * x
        elif off > 0:
            seg = lax.dynamic_slice(x, (off,), (n - off,))
            y = y.at[: n - off].add(d[: n - off] * seg)
        else:
            k = -off
            seg = lax.dynamic_slice(x, (0,), (n - k,))
            y = y.at[k:].add(d[k:] * seg)
    return y


def main():
    print(f"devices: {jax.devices()}", flush=True)
    n3 = 100
    n = n3 ** 3
    a = gallery.poisson_3d(n3)
    A = csr_to_dia(a, dtype=np.float32)
    offsets = A.offsets
    data2d = A.data
    rows = tuple(jnp.asarray(np.asarray(A.data)[k]) for k in range(len(offsets)))
    flat = jnp.asarray(np.asarray(A.data).reshape(-1))
    x0 = jnp.asarray(
        np.random.default_rng(3).standard_normal(n).astype(np.float32)
    )

    # sanity: same results
    y_ref = dia_spmv_xla(data2d, offsets, x0)
    y_rows = spmv_rows(rows, offsets, x0)
    err = float(jnp.max(jnp.abs(y_ref - y_rows)))
    print(f"rows-form max err: {err:.3e}", flush=True)

    # --- 1. per-diag tuple args -----------------------------------------
    def mv_rows(it, v, rows):
        return jnp.sum(
            lax.fori_loop(
                0, it, lambda i, u: spmv_rows(rows, offsets, u) / 6.0, v
            )
        )

    f1 = jax.jit(mv_rows)
    print(
        f"RESULT matvec_rows_args: "
        f"{slope(lambda it: float(f1(it, x0, rows)), 100, 700):.2f} us/iter",
        flush=True,
    )

    # --- 2. flat 1-D arg, static slices ----------------------------------
    def mv_flat(it, v, flat):
        rws = tuple(
            lax.slice(flat, (k * n,), ((k + 1) * n,))
            for k in range(len(offsets))
        )
        return jnp.sum(
            lax.fori_loop(
                0, it, lambda i, u: spmv_rows(rws, offsets, u) / 6.0, v
            )
        )

    f2 = jax.jit(mv_flat)
    print(
        f"RESULT matvec_flat_args: "
        f"{slope(lambda it: float(f2(it, x0, flat)), 100, 700):.2f} us/iter",
        flush=True,
    )

    # --- 2b. flat 1-D arg, slices INSIDE the body ------------------------
    def mv_flat_in(it, v, flat):
        def body(i, u):
            rws = tuple(
                lax.slice(flat, (k * n,), ((k + 1) * n,))
                for k in range(len(offsets))
            )
            return spmv_rows(rws, offsets, u) / 6.0

        return jnp.sum(lax.fori_loop(0, it, body, v))

    f2b = jax.jit(mv_flat_in)
    print(
        f"RESULT matvec_flat_inbody_args: "
        f"{slope(lambda it: float(f2b(it, x0, flat)), 100, 700):.2f} us/iter",
        flush=True,
    )

    # --- 3. bare CG with flat args + jacobi -------------------------------
    dinv = 1.0 / jnp.asarray(np.asarray(A.data)[offsets.index(0)])

    def cg_flat(it, bb, flat, dinv):
        rws = tuple(
            lax.slice(flat, (k * n,), ((k + 1) * n,))
            for k in range(len(offsets))
        )
        x = jnp.zeros_like(bb)
        r = bb
        z = dinv * r
        p = z
        rz = jnp.vdot(r, z)

        def body(i, s):
            x, r, z, p, rz = s
            ap = spmv_rows(rws, offsets, p)
            pap = jnp.vdot(p, ap)
            alpha = rz / pap
            x = x + alpha * p
            r = r - alpha * ap
            z = dinv * r
            rz_new = jnp.vdot(r, z)
            p = z + (rz_new / rz) * p
            return (x, r, z, p, rz_new)

        out = lax.fori_loop(0, it, body, (x, r, z, p, rz))
        return jnp.sum(out[0])

    f3 = jax.jit(cg_flat)
    b = jnp.ones(n, dtype=jnp.float32)
    print(
        f"RESULT cg_flat_args: "
        f"{slope(lambda it: float(f3(it, b, flat, dinv)), 200, 1400):.2f} us/iter",
        flush=True,
    )

    # --- controls ----------------------------------------------------------
    f4 = jax.jit(
        lambda it, v, Aa: jnp.sum(
            lax.fori_loop(0, it, lambda i, u: Aa.matvec(u) / 6.0, v)
        )
    )
    print(
        f"RESULT matvec_2d_args_ctl: "
        f"{slope(lambda it: float(f4(it, x0, A)), 100, 700):.2f} us/iter",
        flush=True,
    )
    f5 = jax.jit(
        lambda it, v: jnp.sum(
            lax.fori_loop(0, it, lambda i, u: A.matvec(u) / 6.0, v)
        )
    )
    print(
        f"RESULT matvec_closure_ctl: "
        f"{slope(lambda it: float(f5(it, x0)), 100, 700):.2f} us/iter",
        flush=True,
    )


if __name__ == "__main__":
    main()
