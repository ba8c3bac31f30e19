"""Round-5 stage 4: args-form matvec with the EXACT dia_spmv_xla fusion
structure (padded x + slice views, one elementwise fusion) over per-diag
1-D leaves. Stage 3's rows/flat forms used .at[].add (materializes a
4 MB buffer per diagonal) — this isolates the layout effect with the
production kernel structure.

Run: nohup python tools/tpu_r5_stage4.py > /tmp/r5_stage4.log 2>&1 &
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


def spmv_sliced(rows, offsets, x):
    """dia_spmv_xla with ``rows`` any indexable of per-diag (n,) arrays."""
    n = x.shape[0]
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    xp = jnp.pad(x, (lo, hi)) if lo or hi else x
    acc = None
    for k, off in enumerate(offsets):
        w = lax.slice_in_dim(xp, lo + off, lo + off + n)
        term = rows[k] * w
        acc = term if acc is None else acc + term
    return acc


def main():
    print(f"devices: {jax.devices()}", flush=True)
    n3 = 100
    n = n3 ** 3
    a = gallery.poisson_3d(n3)
    A = csr_to_dia(a, dtype=np.float32)
    offsets = A.offsets
    nd = len(offsets)
    rows = tuple(jnp.asarray(np.asarray(A.data)[k]) for k in range(nd))
    flat = jnp.asarray(np.asarray(A.data).reshape(-1))
    x0 = jnp.asarray(
        np.random.default_rng(3).standard_normal(n).astype(np.float32)
    )
    b = jnp.ones(n, dtype=jnp.float32)

    y_ref = dia_spmv_xla(A.data, offsets, x0)
    err = float(jnp.max(jnp.abs(y_ref - spmv_sliced(rows, offsets, x0))))
    print(f"sliced rows-form max err: {err:.3e}", flush=True)

    # --- rows tuple args, fused form -------------------------------------
    f1 = jax.jit(
        lambda it, v, rows: jnp.sum(
            lax.fori_loop(
                0, it, lambda i, u: spmv_sliced(rows, offsets, u) / 6.0, v
            )
        )
    )
    print(
        f"RESULT mvfused_rows_args: "
        f"{slope(lambda it: float(f1(it, x0, rows)), 100, 700):.2f} us/iter",
        flush=True,
    )

    # --- flat arg, sliced outside loop, fused form ------------------------
    def mv_flat(it, v, flat):
        rws = tuple(
            lax.slice(flat, (k * n,), ((k + 1) * n,)) for k in range(nd)
        )
        return jnp.sum(
            lax.fori_loop(
                0, it, lambda i, u: spmv_sliced(rws, offsets, u) / 6.0, v
            )
        )

    f2 = jax.jit(mv_flat)
    print(
        f"RESULT mvfused_flat_args: "
        f"{slope(lambda it: float(f2(it, x0, flat)), 100, 700):.2f} us/iter",
        flush=True,
    )

    # --- full CG loop, rows args, fused form + jacobi ---------------------
    dinv = 1.0 / rows[offsets.index(0)]

    def cg_rows(it, bb, rows, dinv):
        x = jnp.zeros_like(bb)
        r = bb
        z = dinv * r
        p = z
        rz = jnp.vdot(r, z)

        def body(i, s):
            x, r, z, p, rz = s
            ap = spmv_sliced(rows, offsets, p)
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

    f3 = jax.jit(cg_rows)
    print(
        f"RESULT cgfused_rows_args: "
        f"{slope(lambda it: float(f3(it, b, rows, dinv)), 200, 1400):.2f} us/iter",
        flush=True,
    )

    # --- control: closure, same fused rows form ---------------------------
    f4 = jax.jit(
        lambda it, v: jnp.sum(
            lax.fori_loop(
                0, it, lambda i, u: spmv_sliced(rows, offsets, u) / 6.0, v
            )
        )
    )
    print(
        f"RESULT mvfused_rows_closure: "
        f"{slope(lambda it: float(f4(it, x0)), 100, 700):.2f} us/iter",
        flush=True,
    )


if __name__ == "__main__":
    main()
