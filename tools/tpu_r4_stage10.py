"""Round-4 stage 10: bisect the single-PCG 1M per-iteration cost.

Stage-5/6 measured the shipped pcg at 94.5-95.5 us/iter (DIA) and
209 us/iter (Stencil3D) at 1M dof, vs the round-2 CLAUDE.md claim of
18-22 us/iter ("everything VMEM-resident, plain XLA"). If the loop state
really stays VMEM-resident, an iteration's ~104 MB logical traffic
should cost ~30-50 us; 95 us is HBM speed. Bisect with a ladder of
variants, all slope-timed (CLAUDE.md methodology), all operands passed
as jit ARGUMENTS (the relay 413s on MB-scale HLO literals):

  [V0] DIA matvec alone, chained x <- (A x)/8 (fori_loop)
  [V1] matvec + <p,Ap> dot, chained
  [V2] minimal PCG, fori_loop: no convergence check, no history,
       5-field tuple carry (x, r, z, p, rz)
  [V3] V2 + UNPRECONDITIONED res dot + while_loop with done flag and
       iteration counter (the shipped loop's control structure)
  [V4] shipped pcg(tol=0, maxiter=it, true_residual=False)  [repro 95]
  [V5] shipped pcg, norm_type=NATURAL (drops the extra <r,r> dot)
  [V6] shipped pcg, single_reduction=True
  [S0] Stencil3D matvec alone
  [S4] shipped pcg on Stencil3D  [repro 209]

Interpretation guide: V0 bounds the matvec; V2-V0 is the PCG vector
work; V3-V2 is the control-structure cost; V4-V3 is whatever the
shipped carry/stats add.
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

print("backend:", jax.default_backend(), jax.devices(), flush=True)

n1 = 100 ** 3
a1 = gallery.poisson_3d(100)
A1d = csr_to_dia(a1, dtype=np.float32)
A1s = gallery.poisson_3d_stencil(100, dtype=jnp.float32)
b1 = jnp.ones(n1, jnp.float32)
OFFS = A1d.offsets
data1 = A1d.data
dinv1 = 1.0 / A1d.diagonal()


def slope(make, lo=200, hi=1400, reps=3, tag=""):
    ts = {}
    for it in (lo, hi):
        f = make(it)
        float(f())  # compile + warm
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            float(f())
            best = min(best, time.time() - t0)
        ts[it] = best
    dt = (ts[hi] - ts[lo]) / (hi - lo)
    print(f"[{tag}] {dt*1e6:.1f} us/iter   (lo {ts[lo]*1e3:.1f} ms, hi {ts[hi]*1e3:.1f} ms)", flush=True)
    return dt


# --- V0: matvec alone ------------------------------------------------------
def mk_v0(it):
    def run(data, x):
        def body(i, x):
            return dia_spmv_xla(data, OFFS, x) * 0.125
        x = lax.fori_loop(0, it, body, x)
        return jnp.sum(x)
    f = jax.jit(run)
    return lambda: f(data1, b1)


# --- V1: matvec + dot ------------------------------------------------------
def mk_v1(it):
    def run(data, x0):
        def body(i, c):
            x, acc = c
            y = dia_spmv_xla(data, OFFS, x)
            return y * 0.125, acc + jnp.sum(x * y)
        x, acc = lax.fori_loop(0, it, body, (x0, jnp.float32(0)))
        return acc + jnp.sum(x)
    f = jax.jit(run)
    return lambda: f(data1, b1)


# --- V2: minimal PCG, fori_loop -------------------------------------------
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

        x, r, z, p, rz = lax.fori_loop(0, it, body, (x, r, z, p, rz))
        return rz
    f = jax.jit(run)
    return lambda: f(data1, dinv1, b1)


# --- V3: + res dot + while_loop control ------------------------------------
def mk_v3(it):
    def run(data, dinv, b):
        r = b
        z = dinv * r
        p = z
        rz = jnp.sum(r * z)
        x = jnp.zeros_like(b)
        res0 = jnp.sqrt(jnp.sum(r * r))
        state = (x, r, z, p, rz, jnp.int32(0), res0, jnp.bool_(False))

        def cond(c):
            return (~c[7]) & (c[5] < it)

        def body(c):
            x, r, z, p, rz, i, res, done = c
            ap = dia_spmv_xla(data, OFFS, p)
            pap = jnp.sum(p * ap)
            alpha = rz / pap
            x = x + alpha * p
            r = r - alpha * ap
            z = dinv * r
            rz_new = jnp.sum(r * z)
            res = jnp.sqrt(jnp.sum(r * r))
            beta = rz_new / rz
            p = z + beta * p
            done = res <= jnp.float32(0.0)
            return (x, r, z, p, rz_new, i + 1, res, done)

        c = lax.while_loop(cond, body, state)
        return c[4]
    f = jax.jit(run)
    return lambda: f(data1, dinv1, b1)


# --- shipped pcg variants ---------------------------------------------------
from kryst_tpu import JacobiPC, pcg
from kryst_tpu.core.convergence import NormType

M1d = JacobiPC.setup(A1d)
M1s = JacobiPC.setup(A1s)


def mk_pcg(Aop, Mop, it, **kw):
    f = jax.jit(
        lambda Aa, bb, Mm: pcg(
            Aa, bb, M=Mm, tol=0.0, maxiter=it, true_residual=False, **kw
        )[1].final_residual
    )
    return lambda: f(Aop, b1, Mop)


# --- Stencil3D --------------------------------------------------------------
def mk_s0(it):
    def run(Aop, x):
        def body(i, x):
            return Aop.matvec(x) * 0.125
        x = lax.fori_loop(0, it, body, x)
        return jnp.sum(x)
    f = jax.jit(run)
    return lambda: f(A1s, b1)


slope(mk_v0, tag="V0 dia matvec alone")
slope(mk_v1, tag="V1 matvec+dot")
slope(mk_v2, tag="V2 minimal pcg fori")
slope(mk_v3, tag="V3 +res dot, while_loop")
slope(lambda it: mk_pcg(A1d, M1d, it), tag="V4 shipped pcg (dia)")
slope(lambda it: mk_pcg(A1d, M1d, it, norm_type=NormType.NATURAL), tag="V5 pcg natural-norm")
slope(lambda it: mk_pcg(A1d, M1d, it, single_reduction=True), tag="V6 pcg single-reduction")
slope(mk_s0, tag="S0 stencil matvec alone")
slope(lambda it: mk_pcg(A1s, M1s, it), tag="S4 shipped pcg (stencil)")

print("R4 STAGE 10 DONE", flush=True)
