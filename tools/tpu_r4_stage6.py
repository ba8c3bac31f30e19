"""Round-4 stage 6: decompose the ca_gmres 8M cost (7.2 ms/iter vs the
1.09 ms traffic bound, BENCH r4 worst metric).

Components per restart cycle (m=s=30, t=1) slope-timed independently by
chained-scan (data-dependent carry so nothing hoists):
  [P] _newton_shifts prepass (30-step MGS Arnoldi on 8M vectors — reads
      the (31, 8M) basis twice per step: suspected dominant)
  [G] basis generation scan (s shifted matvecs + P0 write)
  [N] exact norm equilibration pass (d2 + P0/d)
  [B] BCGS2 (C1, P1, C2, P2 vs a (31, 8M) Q)
  [Q] CholeskyQR3 (3x Gram + solve_triangular on (30, 8M))
  [T] one solve_triangular(L, K) alone on (30, 8M) — XLA TriangularSolve
      with tall RHS may lower badly on TPU; alternative L^-1 @ K matmul
  [U] y @ Z update + residual matvec (small)
Also: single PCG per-iter on the Stencil3D operator vs the DIA operator
(stage-5 read 94.5 us/iter on DIA; CLAUDE.md's 22 us was stencil).
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
from kryst_tpu.ops.dia import csr_to_dia

print("backend:", jax.default_backend(), jax.devices(), flush=True)

S = 30


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


def chain(fn, *args, lo=2, hi=6, reps=2):
    """Slope over chained applications of fn (first arg is the carry)."""
    def mk(nrep):
        def impl(x0, *rest):
            def step(c, _):
                return fn(c, *rest), None
            return jnp.sum(lax.scan(step, x0, None, length=nrep)[0])
        f = jax.jit(impl)
        return lambda: f(*args)
    return slope(mk, lo, hi, reps=reps)


t0 = time.time()
a8 = gallery.poisson_3d(200)
n8 = 200 ** 3
A8 = csr_to_dia(a8, dtype=np.float32)
print(f"8M assembly {time.time()-t0:.0f}s", flush=True)

rng = np.random.default_rng(0)
v0 = jnp.asarray(rng.standard_normal(n8).astype(np.float32))
P30 = jnp.asarray(rng.standard_normal((S, n8)).astype(np.float32) / n8**0.5)
Q31 = jnp.asarray(rng.standard_normal((S + 1, n8)).astype(np.float32) / n8**0.5)
Lc = jnp.asarray(np.tril(rng.standard_normal((S, S)) + 8 * np.eye(S)).astype(np.float32))

from kryst_tpu.solvers import ca_gmres as cam

# [P] prepass / newton shifts
def f_prepass(v, A):
    re, imsq, gam = cam._newton_shifts(A.matvec, v, S, None, jnp.float32)
    return v * (1.0 + 1e-9 * jnp.sum(re))

dt = chain(f_prepass, v0, A8)
print(f"[P] _newton_shifts (30-step MGS prepass): {dt*1e3:.1f} ms", flush=True)

# [G] basis generation scan
sh_re = jnp.zeros(S, jnp.float32)
sh_q = jnp.zeros(S, jnp.float32)
sh_g = jnp.full((S,), 6.0, jnp.float32)

def f_gen(v, A):
    def gen(carry, inp):
        u_prev, u = carry
        re_i, q_i, g_i = inp
        w = (A.matvec(u) - re_i * u + q_i * u_prev) / g_i
        return (u, w), w
    _, P0 = lax.scan(gen, (jnp.zeros_like(v), v), (sh_re, sh_q, sh_g))
    return v + 1e-9 * P0[-1]

dt = chain(f_gen, v0, A8)
print(f"[G] basis scan (30 shifted matvecs): {dt*1e3:.1f} ms", flush=True)

# [N] normalization pass
def f_norm(P):
    d2 = jnp.sum(P * P, axis=1)
    d = jnp.maximum(jnp.sqrt(d2), 1e-30)
    return P / d[:, None] + 1e-9

dt = chain(f_norm, P30)
print(f"[N] equilibration (d2 + P/d): {dt*1e3:.1f} ms", flush=True)

# [B] BCGS2
def _mm(a, b):
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)

def f_bcgs2(P, Q):
    C1 = _mm(P, Q.T)
    P1 = P - _mm(C1, Q)
    C2 = _mm(P1, Q.T)
    return P1 - _mm(C2, Q)

dt = chain(f_bcgs2, P30, Q31)
print(f"[B] BCGS2 (2x project+correct vs (31,8M)): {dt*1e3:.1f} ms", flush=True)

# [Q] CholeskyQR3 as implemented
def f_qr3(P):
    Q3, L = cam._cholqr2(P, None)
    return Q3 * (1.0 + 1e-9 * jnp.sum(L))

dt = chain(f_qr3, P30)
print(f"[Q] CholeskyQR3: {dt*1e3:.1f} ms", flush=True)

# [T] one TriangularSolve vs explicit inverse matmul
def f_tri(K, L):
    return jax.scipy.linalg.solve_triangular(L, K, lower=True) * (1 + 1e-9)

dt = chain(f_tri, P30, Lc)
print(f"[T1] solve_triangular(L, (30,8M)): {dt*1e3:.1f} ms", flush=True)

def f_inv(K, L):
    Linv = jax.scipy.linalg.solve_triangular(
        L, jnp.eye(S, dtype=K.dtype), lower=True
    )
    return _mm(Linv, K) * (1 + 1e-9)

dt = chain(f_inv, P30, Lc)
print(f"[T2] L^-1 (tiny) then matmul: {dt*1e3:.1f} ms", flush=True)

# [U] update + residual
yv = jnp.asarray(rng.standard_normal(S).astype(np.float32))

def f_upd(v, A, Z):
    x = v + _mm(yv, Z)
    r = v - A.matvec(x)
    return v + 1e-9 * r

dt = chain(f_upd, v0, A8, P30)
print(f"[U] y@Z update + residual matvec: {dt*1e3:.1f} ms", flush=True)

del P30, Q31

# --- single PCG on Stencil3D vs DIA (the 94.5 vs 22 us/iter question)
from kryst_tpu import JacobiPC, pcg

n1 = 100 ** 3
A1s = gallery.poisson_3d_stencil(100, dtype=jnp.float32)
a1 = gallery.poisson_3d(100)
A1d = csr_to_dia(a1, dtype=np.float32)
b1 = jnp.ones(n1, jnp.float32)

for tag, Aop in (("stencil", A1s), ("dia", A1d)):
    M1 = JacobiPC.setup(Aop)
    dt = slope(
        lambda it: (
            lambda f=jax.jit(
                lambda Aa, bb, Mm, it=it: pcg(
                    Aa, bb, M=Mm, tol=0.0, maxiter=it, true_residual=False,
                )[1].iterations
            ): f(Aop, b1, M1)
        ),
        200, 1400, reps=3,
    )
    print(f"[S] single PCG 1M ({tag}): {dt*1e6:.1f} us/iter", flush=True)

print("R4 STAGE 6 DONE", flush=True)
