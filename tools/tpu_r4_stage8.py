"""Round-4 stage 8: post-fix re-measurements on the chip.

  1. 8M GMG probe setup with the per-axis masked-contraction extraction
     (stage-7 layout rewrite OOM-fixed but still slow: L0 probe+prune
     phases of 93 s / 242 s back-to-back — suspected padded-strided
     transpose execution + a possible per-process cache miss).
     Run the setup TWICE in this process and report both; the driver
     can re-run the script to check cross-process cache stability.
  2. ca_gmres 8M per-iteration after the 12-step prepass + unrolled
     basis generation (was 7.20 ms/iter; components now bound ~1.7).
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
from kryst_tpu.pc.gmg import GMGPC

print("backend:", jax.default_backend(), jax.devices(), flush=True)

t0 = time.time()
a8 = gallery.poisson_3d(200)
n8 = 200 ** 3
print(f"8M CSR assembly {time.time()-t0:.0f}s", flush=True)

kw = dict(
    grid=(200,) * 3, nu_pre=2, nu_post=2, dtype=np.float32,
    smoother="chebyshev", coeff_dtype=jnp.bfloat16, symmetric=True,
)
for tag in ("cold", "warm"):
    t0 = time.time()
    pc_p = GMGPC.setup(a8, rap="probe", **kw)
    print(f"[1] 8M probe setup ({tag}): {time.time()-t0:.1f}s "
          f"({len(pc_p.levels)} levels)", flush=True)
t0 = time.time()
pc_h = GMGPC.setup(a8, **kw)
print(f"[1] 8M host setup (reference): {time.time()-t0:.1f}s", flush=True)
r = jnp.asarray(np.random.default_rng(1).standard_normal(n8).astype(np.float32))
zh = jax.jit(pc_h.apply)(r)
zp = jax.jit(pc_p.apply)(r)
print(f"[1] V-cycle rel diff: "
      f"{float(jnp.linalg.norm(zp-zh)/jnp.linalg.norm(zh)):.2e}", flush=True)
del pc_h, pc_p, zh, zp, r

# ---------------------------------------------------------------- ca_gmres
A8 = csr_to_dia(a8, dtype=np.float32)
b8 = jnp.ones(n8, jnp.float32)
from kryst_tpu.solvers.ca_gmres import ca_gmres

f_its = jax.jit(
    lambda A, bb: ca_gmres(A, bb, tol=0.0, maxiter=60, restart=30)[1].iterations
)
its_ca = int(f_its(A8, b8))

def mk_ca(nrep):
    def f_impl(A, bb):
        def step(carry, _):
            x, _s = ca_gmres(A, carry, tol=0.0, maxiter=60, restart=30)
            return carry + 1e-6 * x, None
        return jnp.sum(lax.scan(step, bb, None, length=nrep)[0])
    f = jax.jit(f_impl)
    return lambda: f(A8, b8)

def slope(make, lo, hi, reps=2):
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

dt_solve = slope(mk_ca, 1, 3, reps=2)
dt_ca = dt_solve / max(its_ca, 1)
print(f"[2] ca_gmres(30,s=30) 8M: {dt_ca*1e3:.2f} ms/iter "
      f"({its_ca} its/solve; was 7.20, bound ~1.09)", flush=True)
print("R4 STAGE 8 DONE", flush=True)
