"""Stage A: const-stencil kernel on the REAL TPU at 8M dof.

Validates the Mosaic compile (vector i32 div/rem by constants is the
risky lowering), checks numerics vs the planned streamed kernel
on-device, then slope-times: const vs planned matvec, fused smooth,
matvec_dot, and the bf16-coefficient planned variant.
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

print("backend:", jax.default_backend(), flush=True)

t0 = time.time()
a8 = gallery.poisson_3d(200)
n8 = 200 ** 3
A_cs = csr_to_dia(a8, dtype=np.float32, grid=(200, 200, 200))
A_pl = csr_to_dia(a8, dtype=np.float32)  # planned streaming baseline
print(f"setup {time.time()-t0:.0f}s; cs={A_cs.cs_deltas is not None} "
      f"pallas={A_cs.cs_pallas} plan={A_pl.data_blk is not None}", flush=True)
assert A_cs.cs_pallas

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(n8).astype(np.float32))

# --- numerics: const vs planned matvec, on-device comparison ---------
@jax.jit
def relerr(A1, A2, v):
    y1 = A1.matvec(v)
    y2 = A2.matvec(v)
    return jnp.linalg.norm(y1 - y2) / jnp.linalg.norm(y2)

t0 = time.time()
e = float(relerr(A_cs, A_pl, x))
print(f"matvec rel diff const-vs-planned: {e:.3e}  [{time.time()-t0:.0f}s]",
      flush=True)
assert e < 1e-5, e

# --- slope timing helpers --------------------------------------------
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
    print(f"{label}: {dt*1e6:.1f} us/matvec -> {traffic_bytes/dt/1e9:.0f} GB/s",
          flush=True)
    return dt

# traffic: planned = coeffs 9 planes (7 diag padded layout ~9) + x + y;
# const = x + y only
t_pl = mv_slope(A_pl, "planned streamed", (A_pl.data_blk.size + 2 * n8) * 4)
t_cs = mv_slope(A_cs, "const stencil   ", 2 * n8 * 4)
print(f"const speedup: {t_pl/t_cs:.2f}x", flush=True)

# --- fused smooth epilogue -------------------------------------------
dinv = jnp.full((n8,), 1.0 / 6.0, jnp.float32)
r0 = jnp.asarray(rng.standard_normal(n8).astype(np.float32))

def smooth_slope(A, label):
    dt = slope(
        lambda it: (
            lambda f=jax.jit(
                lambda Av, z0, rr, dd, it=it: jnp.sum(
                    lax.fori_loop(
                        0, it,
                        lambda i, z: Av.smooth_jacobi(z, rr, dd, 0.7) / 1.0001,
                        z0,
                    )
                )
            ): f(A, x, r0, dinv)
        ),
        50, 350,
    )
    print(f"{label}: {dt*1e6:.1f} us/smooth", flush=True)
    return dt

s_pl = smooth_slope(A_pl, "planned smooth")
s_cs = smooth_slope(A_cs, "const smooth  ")

# numerics of the fused smooth
@jax.jit
def smooth_err(A1, A2, z, rr, dd):
    a = A1.smooth_jacobi(z, rr, dd, 0.7)
    b = A2.smooth_jacobi(z, rr, dd, 0.7)
    return jnp.linalg.norm(a - b) / jnp.linalg.norm(b)
e2 = float(smooth_err(A_cs, A_pl, x, r0, dinv))
print(f"smooth rel diff: {e2:.3e}", flush=True)
assert e2 < 1e-5, e2

# --- matvec_dot -------------------------------------------------------
def dot_slope(A, label):
    dt = slope(
        lambda it: (
            lambda f=jax.jit(
                lambda Av, v, it=it: lax.fori_loop(
                    0, it,
                    lambda i, c: (lambda yd: (yd[0] / 6.0, c[1] + yd[1]))(
                        Av.matvec_dot(c[0])
                    ),
                    (v, jnp.float32(0)),
                )[1]
            ): f(A, x)
        ),
        25, 175,
    )
    print(f"{label}: {dt*1e6:.1f} us/(matvec+dot)", flush=True)
    return dt

d_cs = dot_slope(A_cs, "const matvec_dot")

# --- bf16 coefficient streaming --------------------------------------
A_bf = A_pl.planned(blk_dtype=jnp.bfloat16)
t_bf = mv_slope(A_bf, "planned bf16    ", (A_bf.data_blk.size * 2 + 2 * n8 * 4))
print(f"bf16 speedup over f32 planned: {t_pl/t_bf:.2f}x", flush=True)
print("STAGE A DONE", flush=True)
