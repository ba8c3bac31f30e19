"""Round-4 stage 5 on the real TPU.

Validates the block-CG small-solve fix (Cholesky fast path + lax.cond
eigen-rescue) and the widened bench slope spans:
  1. block_pcg 1M k=8 per-block-iteration — must be back near the
     1.11 ms Cholesky-only number (the unconditional eig solve measured
     9.22 ms in the 14:19 bench run; if the lax.cond costs the same we
     know XLA executes both branches and the rescue must move out of
     the loop);
  2. single PCG 1M per-iteration with the widened 200->1400 span — the
     old 100->300 span read 252 us/iter (relay jitter); CLAUDE.md's
     documented number is 22-24 us;
  3. block_pcg 8M k=8 (interleaved carrier + fused matvec/Gram) — full
     solver per-iteration + finiteness near convergence (the case the
     eigen-rescue exists for).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from kryst_tpu import JacobiPC, pcg
from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import csr_to_dia
from kryst_tpu.solvers.block_cg import block_pcg

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


# ------------------------------------------------------------------ 1M
t0 = time.time()
a = gallery.poisson_3d(100)
n = 100 ** 3
A = csr_to_dia(a, dtype=np.float32)
M = JacobiPC.setup(A)
b = jnp.ones(n, jnp.float32)
B8 = jnp.asarray(
    np.random.default_rng(5).standard_normal((n, 8)).astype(np.float32)
)
print(f"1M assembly {time.time()-t0:.0f}s", flush=True)

dt_blk = slope(
    lambda it: (
        lambda f=jax.jit(
            lambda Aa, Bb, Mm, it=it: block_pcg(
                Aa, Bb, M=Mm, tol=0.0, maxiter=it
            )[1].iterations
        ): f(A, B8, M)
    ),
    50, 150, reps=3,
)
print(f"[1] block_pcg 1M k=8 (cond rescue): {dt_blk*1e6:.1f} us/block-iter "
      f"(Cholesky-only was 1112, eig-only 9219)", flush=True)

dt_pcg1 = slope(
    lambda it: (
        lambda f=jax.jit(
            lambda Aa, bb, Mm, it=it: pcg(
                Aa, bb, M=Mm, tol=0.0, maxiter=it, true_residual=False,
            )[1].iterations
        ): f(A, b, M)
    ),
    200, 1400, reps=3,
)
print(f"[2] single PCG 1M wide-span: {dt_pcg1*1e6:.1f} us/iter "
      f"(docs say 22-24; old narrow span read 252)", flush=True)

del A, M, b, B8

# ------------------------------------------------------------------ 8M
t0 = time.time()
a8 = gallery.poisson_3d(200)
n8 = 200 ** 3
A8 = csr_to_dia(a8, dtype=np.float32)
M8 = JacobiPC.setup(A8)
B8_8 = jnp.asarray(
    np.random.default_rng(7).standard_normal((n8, 8)).astype(np.float32)
)
print(f"8M assembly {time.time()-t0:.0f}s; inter_ok(8)={A8.inter_ok(8)}",
      flush=True)

dt_blk8 = slope(
    lambda it: (
        lambda f=jax.jit(
            lambda Aa, Bb, Mm, it=it: block_pcg(
                Aa, Bb, M=Mm, tol=0.0, maxiter=it
            )[1].iterations
        ): f(A8, B8_8, M8)
    ),
    8, 24, reps=2,
)
print(f"[3] block_pcg 8M k=8 (inter carrier): {dt_blk8*1e3:.2f} ms/block-iter "
      f"({dt_blk8/8*1e6:.0f} us/RHS; matvec+gram alone 2.52 ms)", flush=True)

# finiteness near convergence: the indefinite-Gram case the rescue
# protects — run a REAL tolerance solve to (past) the f32 floor
X, st = jax.jit(
    lambda Aa, Bb, Mm: block_pcg(Aa, Bb, M=Mm, tol=1e-7, maxiter=400)
)(A8, B8_8, M8)
finite = bool(jnp.all(jnp.isfinite(X)))
print(f"[4] block_pcg 8M k=8 tol=1e-7: iters={int(st.iterations)} "
      f"finite={finite} reached={bool(jnp.all(st.reached_tol))} "
      f"max_rel={float(jnp.max(st.rel_residual)):.2e}", flush=True)
assert finite, "NaN carry — the eigen-rescue failed"
print("R4 STAGE 5 DONE", flush=True)
