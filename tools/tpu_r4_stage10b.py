"""Stage 10b: disambiguate the V0-vs-V4 paradox from stage 10.

Stage 10 measured the bare DIA matvec loop at 300 us/iter but the full
shipped pcg at 98 us/iter — a superset of the work, 3x faster. Either
(a) the shipped pcg while_loop EXITS EARLY (done flag at the f32 floor),
making the slope denominator a lie, or (b) the chained-matvec loop is
pathological (overflow -> Inf/NaN, or a fusion difference).

  [I] pcg(tol=0, maxiter=1400).iterations — the smoking gun for (a)
  [V4b] shipped pcg slope at (2000, 4000): if the loop exits early the
        slope collapses toward 0
  [V0n] matvec loop with per-step normalization (no overflow possible)
  [V0f] matvec loop value check: print the final sum (Inf/NaN?)
  [V2b] minimal PCG fori slope at (2000, 4000) — linearity check
"""
import sys, time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax import lax

from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import csr_to_dia, dia_spmv_xla
from kryst_tpu import JacobiPC, pcg

print("backend:", jax.default_backend(), jax.devices(), flush=True)

n1 = 100 ** 3
a1 = gallery.poisson_3d(100)
A1d = csr_to_dia(a1, dtype=np.float32)
b1 = jnp.ones(n1, jnp.float32)
OFFS = A1d.offsets
data1 = A1d.data
dinv1 = 1.0 / A1d.diagonal()
M1d = JacobiPC.setup(A1d)


def slope(make, lo, hi, reps=3, tag=""):
    ts = {}
    for it in (lo, hi):
        f = make(it)
        float(f())
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            float(f())
            best = min(best, time.time() - t0)
        ts[it] = best
    dt = (ts[hi] - ts[lo]) / (hi - lo)
    print(f"[{tag}] {dt*1e6:.1f} us/iter   (lo {ts[lo]*1e3:.1f} ms, hi {ts[hi]*1e3:.1f} ms)", flush=True)
    return dt


# [I] iteration counts at tol=0
for mi in (1400, 4000):
    f = jax.jit(
        lambda Aa, bb, Mm, mi=mi: pcg(
            Aa, bb, M=Mm, tol=0.0, maxiter=mi, true_residual=False
        )[1].iterations
    )
    print(f"[I] pcg tol=0 maxiter={mi}: iterations = {int(f(A1d, b1, M1d))}", flush=True)


def mk_pcg(it):
    f = jax.jit(
        lambda Aa, bb, Mm: pcg(
            Aa, bb, M=Mm, tol=0.0, maxiter=it, true_residual=False
        )[1].final_residual
    )
    return lambda: f(A1d, b1, M1d)


slope(mk_pcg, 2000, 4000, tag="V4b shipped pcg slope(2000,4000)")


# [V0n] normalized matvec chain — overflow-proof
def mk_v0n(it):
    def run(data, x):
        def body(i, x):
            y = dia_spmv_xla(data, OFFS, x)
            return y * lax.rsqrt(jnp.sum(y * y))
        return jnp.sum(lax.fori_loop(0, it, body, x))
    f = jax.jit(run)
    return lambda: f(data1, b1)


slope(mk_v0n, 200, 1400, tag="V0n normalized matvec chain")


# [V0f] value check on the stage-10 V0 body
def mk_v0(it):
    def run(data, x):
        def body(i, x):
            return dia_spmv_xla(data, OFFS, x) * 0.125
        return jnp.sum(lax.fori_loop(0, it, body, x))
    f = jax.jit(run)
    return lambda: f(data1, b1)


v = float(mk_v0(300)())
print(f"[V0f] final sum after 300 chained (A x)/8: {v!r}", flush=True)


# [V2b] minimal PCG at high spans
def mk_v2(it):
    def run(data, dinv, b):
        r = b
        z = dinv * r
        p = z
        rz = jnp.sum(r * z)
        x = jnp.zeros_like(b)

        def body(i, c):
            x, r, z, p, rz = c
            ap = dia_spmv_xla(data, OFFS, p)
            pap = jnp.sum(p * ap)
            alpha = rz / pap
            x = x + alpha * p
            r = r - alpha * ap
            z = dinv * r
            rz_new = jnp.sum(r * z)
            beta = rz_new / rz
            p = z + beta * p
            return (x, r, z, p, rz_new)

        return lax.fori_loop(0, it, body, (x, r, z, p, rz))[4]
    f = jax.jit(run)
    return lambda: f(data1, dinv1, b1)


slope(mk_v2, 2000, 4000, tag="V2b minimal pcg slope(2000,4000)")

print("R4 STAGE 10B DONE", flush=True)
