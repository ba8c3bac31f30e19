"""Round-5 stage 5: does slicing the flat panel INSIDE the loop body
(where solvers call matvec) keep stage-4's fused-form speed?

Run: nohup python tools/tpu_r5_stage5.py > /tmp/r5_stage5.log 2>&1 &
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kryst_tpu.matrix import gallery  # noqa: E402
from kryst_tpu.ops.dia import csr_to_dia  # noqa: E402


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
    offsets = A.offsets
    nd = len(offsets)
    flat = jnp.asarray(np.asarray(A.data).reshape(-1))
    x0 = jnp.asarray(
        np.random.default_rng(3).standard_normal(n).astype(np.float32)
    )
    b = jnp.ones(n, dtype=jnp.float32)
    lo_p = max(0, -min(offsets))
    hi_p = max(0, max(offsets))

    def spmv_flat(flat, x):
        """Fused form, slices taken HERE (traces inside the caller)."""
        xp = jnp.pad(x, (lo_p, hi_p))
        acc = None
        for k, off in enumerate(offsets):
            d = lax.slice(flat, (k * n,), ((k + 1) * n,))
            w = lax.slice_in_dim(xp, lo_p + off, lo_p + off + n)
            term = d * w
            acc = term if acc is None else acc + term
        return acc

    # --- matvec loop, slice inside body ----------------------------------
    f1 = jax.jit(
        lambda it, v, flat: jnp.sum(
            lax.fori_loop(0, it, lambda i, u: spmv_flat(flat, u) / 6.0, v)
        )
    )
    print(
        f"RESULT mvfused_flat_inbody: "
        f"{slope(lambda it: float(f1(it, x0, flat)), 100, 700):.2f} us/iter",
        flush=True,
    )

    # --- full PCG-shaped loop, slice inside body, matvec+dot fused -------
    dinv = 1.0 / lax.slice(
        flat, (offsets.index(0) * n,), ((offsets.index(0) + 1) * n,)
    )

    def cg_inbody(it, bb, flat, dinv):
        x = jnp.zeros_like(bb)
        r = bb
        z = dinv * r
        p = z
        rz = jnp.vdot(r, z)

        def body(i, s):
            x, r, z, p, rz = s
            ap = spmv_flat(flat, p)
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

    f2 = jax.jit(cg_inbody)
    print(
        f"RESULT cgfused_flat_inbody: "
        f"{slope(lambda it: float(f2(it, b, flat, dinv)), 200, 1400):.2f} us/iter",
        flush=True,
    )


if __name__ == "__main__":
    main()
