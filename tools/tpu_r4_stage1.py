"""Round-4 stage 1 on the real TPU.

Validates + slope-times the round-4 kernel changes:
  1. auto-bf16 streamed panels (bitwise-exact for bf16-representable
     coefficients — the Poisson stencils) on the 8M matvec;
  2. the transpose-free (k, n) block matvec (matvec_cols) vs the old
     (n, k) entry at 8M k=8;
  3. block_pcg 1M k=8 per-iteration with the new internal layout;
  4. the config4 1M regression (53 ms round 3 vs 34.5 ms round 2):
     V-cycle slope + refined wall for chebyshev vs jacobi smoothers,
     with and without bf16 coefficient panels.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax import lax

from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import csr_to_dia

print("backend:", jax.default_backend(), jax.devices(), flush=True)


def slope(make, lo, hi, reps=3):
    ts = {}
    for it in (lo, hi):
        f = make(it)
        float(f())
        best = 1e9
        for _ in range(reps):
            t1 = time.time()
            float(f())
            best = min(best, time.time() - t1)
        ts[it] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


# ---------------------------------------------------------------- 8M ops
t0 = time.time()
a8 = gallery.poisson_3d(200)
n8 = 200 ** 3
A8 = csr_to_dia(a8, dtype=np.float32)  # auto-bf16 panels expected
print(f"8M assembly {time.time()-t0:.0f}s; panels dtype = "
      f"{A8.data_blk.dtype}", flush=True)
assert A8.data_blk.dtype == jnp.bfloat16, A8.data_blk.dtype

A8f = A8.planned(blk_dtype=jnp.float32)  # explicit f32 panels baseline
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(n8).astype(np.float32))

# 1. bitwise equality of bf16-exact panels vs f32 panels
@jax.jit
def maxdiff(A1, A2, v):
    return jnp.max(jnp.abs(A1.matvec(v) - A2.matvec(v)))

d = float(maxdiff(A8, A8f, x))
print(f"[1] bf16-exact panels max |diff| vs f32 panels: {d:.3e}", flush=True)
assert d == 0.0, d

def mv_slope(A, label, traffic_bytes):
    dt = slope(
        lambda it: (
            lambda f=jax.jit(
                lambda Av, v, it=it: jnp.sum(
                    lax.fori_loop(0, it, lambda i, u: Av.matvec(u) / 6.0, v)
                )
            ): f(A, x)
        ),
        50, 350,
    )
    print(f"[1] {label}: {dt*1e6:.1f} us/matvec "
          f"({traffic_bytes/dt/1e9:.0f} GB/s)", flush=True)
    return dt

t_bf = mv_slope(A8, "matvec auto-bf16", A8.data_blk.size * 2 + 8 * n8)
t_f32 = mv_slope(A8f, "matvec f32      ", A8f.data_blk.size * 4 + 8 * n8)
print(f"[1] auto-bf16 speedup: {t_f32/t_bf:.2f}x", flush=True)

# 2. transpose-free block matvec
kblk = 8
Xk = jnp.asarray(rng.standard_normal((kblk, n8)).astype(np.float32))

# correctness vs per-column matvec (on-device, f32-planned reference)
@jax.jit
def blk_err(A, Xk_):
    Y = A.matvec_cols(Xk_)
    # unrolled per-row reference (vmap over a pallas_call is untested here)
    Yref = jnp.stack([A.matvec(Xk_[j]) for j in range(kblk)])
    return jnp.max(jnp.abs(Y - Yref))

e = float(blk_err(A8, Xk))
print(f"[2] matvec_cols max |diff| vs per-column: {e:.3e}", flush=True)
assert e == 0.0, e

def mkcols(it):
    f = jax.jit(
        lambda A, X, it=it: lax.fori_loop(
            0, it, lambda t, Xc: A.matvec_cols(Xc) * 0.12, X
        )[0, 0]
    )
    return lambda: f(A8, Xk)

def mkblock(it):
    f = jax.jit(
        lambda A, X, it=it: lax.fori_loop(
            0, it, lambda t, Xc: A.matvec_block(Xc) * 0.12, X
        )[0, 0]
    )
    return lambda: f(A8, Xk.T)

dt_cols = slope(mkcols, 8, 24, reps=2)
est = (A8.data_blk.size * 2 + 2 * kblk * n8 * 4) / 650e9
print(f"[2] matvec_cols 8M k=8: {dt_cols*1e3:.2f} ms/call "
      f"(bound ~{est*1e3:.2f} ms)", flush=True)
dt_blkT = slope(mkblock, 8, 24, reps=2)
print(f"[2] matvec_block (n,k) 8M k=8: {dt_blkT*1e3:.2f} ms/call "
      f"-> cols speedup {dt_blkT/dt_cols:.2f}x", flush=True)

del A8f, Xk

# ---------------------------------------------------------------- 1M
from kryst_tpu import JacobiPC, pcg
from kryst_tpu.pc.gmg import GMGPC
from kryst_tpu.solvers.refine import refine_device
import scipy.sparse as sp

t0 = time.time()
a1 = gallery.poisson_3d(100)
n1 = 100 ** 3
A1 = csr_to_dia(a1, dtype=np.float32)
b1 = jnp.ones(n1, jnp.float32)
M1 = JacobiPC.setup(A1)
print(f"1M assembly {time.time()-t0:.0f}s", flush=True)

# 3. block_pcg with the new (k, n) internal layout
from kryst_tpu.solvers.block_cg import block_pcg

B8 = jnp.asarray(rng.standard_normal((n1, 8)).astype(np.float32))
dt_bp = slope(
    lambda it: (
        lambda f=jax.jit(
            lambda Aa, Bb, Mm, it=it: block_pcg(
                Aa, Bb, M=Mm, tol=0.0, maxiter=it
            )[1].iterations
        ): f(A1, B8, M1)
    ),
    50, 150, reps=2,
)
print(f"[3] block_pcg 1M k=8: {dt_bp*1e6:.1f} us/block-iter "
      f"({dt_bp/8*1e6:.1f} us/RHS; round-3 was 1139/142.4)", flush=True)

# 4. config4 1M: smoother/coeff variants
A1_64 = csr_to_dia(a1, dtype=np.float64, grid=(100, 100, 100))
b1_64 = jnp.asarray(np.ones(n1))
a1_sp = sp.csr_matrix(
    (a1.data.astype(np.float64), a1.indices, a1.indptr), shape=a1.shape
)

def vcycle_slope(pc, label):
    r = jnp.asarray(rng.standard_normal(n1).astype(np.float32))
    dt = slope(
        lambda it: (
            lambda f=jax.jit(
                lambda M, rr, it=it: jnp.sum(
                    lax.fori_loop(
                        0, it, lambda i, u: M.apply(u) / 1.0001, rr
                    )
                )
            ): f(pc, r)
        ),
        20, 60, reps=2,
    )
    print(f"[4] V-cycle 1M {label}: {dt*1e3:.3f} ms", flush=True)
    return dt

def refined_wall(pc, label, inner_max=40):
    solve_r = jax.jit(
        lambda A64_, bb, ops_: refine_device(
            A64_, bb,
            lambda r: pcg(ops_[0], r, M=ops_[1], tol=1e-5,
                          maxiter=inner_max, true_residual=False),
            tol=1e-8, max_outer=6,
        )
    )
    f = lambda: float(solve_r(A1_64, b1_64, (A1, pc))[1].outer_iterations)
    f()
    best = 1e9
    for _ in range(3):
        t1 = time.time()
        f()
        best = min(best, time.time() - t1)
    xr, st = solve_r(A1_64, b1_64, (A1, pc))
    rel = float(
        np.linalg.norm(np.asarray(b1_64) - a1_sp @ np.asarray(xr))
        / np.sqrt(n1)
    )
    print(f"[4] refined 1M {label}: {best*1e3:.0f} ms "
          f"(outer={int(st.outer_iterations)}, inner={int(st.inner_iterations)}, "
          f"host_rel={rel:.2e})", flush=True)
    return best

for smoother in ("chebyshev", "jacobi"):
    for cd, cdl in ((None, "auto"), (jnp.bfloat16, "bf16")):
        t0 = time.time()
        pc = GMGPC.setup(
            a1, grid=(100, 100, 100), nu_pre=2, nu_post=2,
            dtype=np.float32, smoother=smoother, coeff_dtype=cd,
        )
        print(f"[4] GMG 1M setup {smoother}/{cdl}: {time.time()-t0:.0f}s",
              flush=True)
        vcycle_slope(pc, f"{smoother}/{cdl}")
        refined_wall(pc, f"{smoother}/{cdl}")
        del pc

print("R4 STAGE 1 DONE", flush=True)
