import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from jax import lax
print("backend:", jax.default_backend(), flush=True)
from kryst_tpu.matrix import gallery
from kryst_tpu.pc.gmg import GMGPC

t0=time.time()
a = gallery.poisson_3d(200); n = 200**3
print(f"assembly {time.time()-t0:.0f}s", flush=True)
t0=time.time()
pc = GMGPC.setup(a, grid=(200,200,200), nu_pre=2, nu_post=2, dtype=np.float32)
print(f"gmg setup {time.time()-t0:.0f}s, levels={len(pc.levels)}", flush=True)
for i, lv in enumerate(pc.levels):
    print(f"  L{i}: fine={lv.fine} ndiag={len(lv.A.offsets)} planned={lv.A.data_blk is not None}", flush=True)

r0 = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))
def sync(v): return float(jnp.sum(v))
def slope(make, lo, hi, reps=3):
    ts={}
    for it in (lo,hi):
        f = make(it); sync(f())
        best=1e9
        for _ in range(reps):
            t1=time.time(); sync(f()); best=min(best,time.time()-t1)
        ts[it]=best
    return (ts[hi]-ts[lo])/(hi-lo)

lv0 = pc.levels[0]
def mk(fbody):
    def m(it):
        @jax.jit
        def f(pc, v):
            return lax.fori_loop(0, it, lambda i, u: fbody(pc, u), v)
        return lambda: f(pc, r0)
    return m

t_mv  = slope(mk(lambda pc, u: pc.levels[0].A.matvec(u)), 4, 24)
print(f"L0 matvec: {t_mv*1e3:.3f} ms", flush=True)
t_sm  = slope(mk(lambda pc, u: u + pc.smooth_omega * pc.levels[0].inv_diag * (r0 - pc.levels[0].A.matvec(u))), 4, 24)
print(f"L0 smooth step: {t_sm*1e3:.3f} ms", flush=True)
t_rs  = slope(mk(lambda pc, u: pc.levels[0].prolong(pc.levels[0].restrict(u))), 4, 24)
print(f"L0 restrict+prolong: {t_rs*1e3:.3f} ms", flush=True)

# sub-cycle at level 1
nc1 = int(np.prod(pc.levels[0].coarse)) if hasattr(pc.levels[0],'coarse') else None
rc = jnp.asarray(np.random.default_rng(1).standard_normal(nc1).astype(np.float32))
def mk1(it):
    @jax.jit
    def f(pc, v):
        return lax.fori_loop(0, it, lambda i, u: pc._vcycle(1, u), v)
    return lambda: f(pc, rc)
t_sub = slope(mk1, 4, 24)
print(f"vcycle from L1: {t_sub*1e3:.3f} ms", flush=True)

def mkv(it):
    @jax.jit
    def f(pc, v):
        return lax.fori_loop(0, it, lambda i, u: pc.apply(u), v)
    return lambda: f(pc, r0)
t_v = slope(mkv, 4, 24)
print(f"FULL vcycle 8M: {t_v*1e3:.3f} ms", flush=True)
acc = 4*t_sm + t_mv + t_rs + t_sub
print(f"accounted: 4*smooth + residual-mv + transfers + subcycle = {acc*1e3:.3f} ms (gap {1e3*(t_v-acc):+.3f} ms)", flush=True)

# bf16 coefficient variant
t0=time.time()
pcb = GMGPC.setup(a, grid=(200,200,200), nu_pre=2, nu_post=2, dtype=np.float32, coeff_dtype=jnp.bfloat16)
print(f"bf16 gmg setup {time.time()-t0:.0f}s", flush=True)
def mkvb(it):
    @jax.jit
    def f(pc, v):
        return lax.fori_loop(0, it, lambda i, u: pc.apply(u), v)
    return lambda: f(pcb, r0)
t_vb = slope(mkvb, 4, 24)
print(f"FULL vcycle 8M bf16-coeff: {t_vb*1e3:.3f} ms", flush=True)

# chebyshev-smoothed variant (same cycle shape, weight schedule only)
t0=time.time()
pcc = GMGPC.setup(a, grid=(200,200,200), nu_pre=2, nu_post=2, dtype=np.float32,
                  smoother="chebyshev")
print(f"cheb gmg setup {time.time()-t0:.0f}s", flush=True)
def mkvc(it):
    @jax.jit
    def f(pc, v):
        return lax.fori_loop(0, it, lambda i, u: pc.apply(u), v)
    return lambda: f(pcc, r0)
t_vc = slope(mkvc, 4, 24)
print(f"FULL vcycle 8M chebyshev: {t_vc*1e3:.3f} ms", flush=True)
