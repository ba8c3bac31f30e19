"""Round-4 stage 2: block-kernel diagnosis + 8M bf16-GMG + ca_gmres metric.

Stage 1 showed the multi-vector streamed kernel costs ~5.9 ms at 8M k=8
against a 0.96 ms bound even without layout transposes. Here:
  1. per-row loop of single-vector planned matvecs over the (k, n)
     block (each row contiguous — expected ~8x single matvec);
  2. block-kernel k-scaling (k=1, 2, 4);
  3. flattened-2-D window variant (no 3-D ref indexing);
  4. lane-aligned synthetic offsets (no pltpu.roll) — isolates roll cost;
  5. 8M refined config4 with coeff_dtype=bf16 GMG (warms bench cache);
  6. the fixed ca_gmres chained-solve metric (warms bench cache).
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
from kryst_tpu.ops.dia import csr_to_dia, DIAOperator
from kryst_tpu.ops.streamed import dia_spmv_planned_cols

sys.path.insert(0, "/root/repo/tools")
from kernel_variants import cols_flat, cols_rowloop

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


t0 = time.time()
a8 = gallery.poisson_3d(200)
n8 = 200 ** 3
A8 = csr_to_dia(a8, dtype=np.float32)  # bf16 panels
print(f"8M assembly {time.time()-t0:.0f}s", flush=True)
rng = np.random.default_rng(0)
pbytes = A8.data_blk.size * A8.data_blk.dtype.itemsize


def fori_slope(fn, X0, label, bytes_per_call, lo=8, hi=24):
    def mk(it):
        f = jax.jit(
            lambda A, X, it=it: lax.fori_loop(
                0, it, lambda t, Xc: fn(A, Xc) * 0.12, X
            )[0, 0]
        )
        return lambda: f(A8, X0)

    dt = slope(mk, lo, hi, reps=2)
    print(f"{label}: {dt*1e3:.3f} ms/call "
          f"({bytes_per_call/dt/1e9:.0f} GB/s)", flush=True)
    return dt


# 1. per-row loop
for k in (8,):
    Xk = jnp.asarray(rng.standard_normal((k, n8)).astype(np.float32))
    bound = (pbytes + 2 * k * n8 * 4)
    fori_slope(lambda A, X: cols_rowloop(A, X), Xk,
               f"[1] rowloop k={k}", k * (pbytes + 8 * n8))

    # 2. block kernel k-scaling
    fori_slope(
        lambda A, X: dia_spmv_planned_cols(A.data_blk, A.offsets, X, A.plan),
        Xk, f"[2] blockkern k={k}", bound,
    )
    # 3. flat 2-D variant (correctness first)
    try:
        Yf = cols_flat(A8.data_blk, A8.offsets, Xk[:, : n8], A8.plan)
        Yr = cols_rowloop(A8, Xk)
        e = float(jnp.max(jnp.abs(Yf - Yr)))
        print(f"[3] flat variant max|diff| = {e:.3e}", flush=True)
        assert e == 0.0, e
        fori_slope(
            lambda A, X: cols_flat(A.data_blk, A.offsets, X, A.plan),
            Xk, f"[3] flatkern  k={k}", bound,
        )
    except Exception as ex:
        print(f"[3] flat variant failed: {type(ex).__name__}: {ex}",
              flush=True)

for k in (1, 2, 4):
    Xk = jnp.asarray(rng.standard_normal((k, n8)).astype(np.float32))
    bound = (pbytes + 2 * k * n8 * 4)
    fori_slope(
        lambda A, X: dia_spmv_planned_cols(A.data_blk, A.offsets, X, A.plan),
        Xk, f"[2] blockkern k={k}", bound,
    )

# 4. lane-aligned offsets (no rolls): offsets all multiples of 128
ndiag = 7
offs = tuple(int(o) * 128 for o in (-3, -2, -1, 0, 1, 2, 3))
data = rng.standard_normal((ndiag, n8)).astype(np.float32)
from kryst_tpu.ops.dia import _make_dia

Aal = _make_dia(data, offs, n8, transpose=False)
print(f"[4] aligned-op panels dtype {Aal.data_blk.dtype}", flush=True)
pb_al = Aal.data_blk.size * Aal.data_blk.dtype.itemsize
Xk8 = jnp.asarray(rng.standard_normal((8, n8)).astype(np.float32))

def mk_al(it):
    f = jax.jit(
        lambda A, X, it=it: lax.fori_loop(
            0, it,
            lambda t, Xc: dia_spmv_planned_cols(
                A.data_blk, A.offsets, Xc, A.plan
            ) * 0.12,
            X,
        )[0, 0]
    )
    return lambda: f(Aal, Xk8)

dt_al = slope(mk_al, 8, 24, reps=2)
print(f"[4] blockkern aligned k=8: {dt_al*1e3:.3f} ms/call "
      f"(bound ~{(pb_al + 2*8*n8*4)/650e9*1e3:.2f})", flush=True)
del Aal, Xk8, data

# 5. 8M refined config4 with bf16-coeff GMG (the bench graph)
from kryst_tpu import JacobiPC, pcg
from kryst_tpu.pc.gmg import GMGPC
from kryst_tpu.solvers.refine import refine_device
import scipy.sparse as sp

t0 = time.time()
pc8 = GMGPC.setup(
    a8, grid=(200, 200, 200), nu_pre=2, nu_post=2,
    dtype=np.float32, smoother="chebyshev", coeff_dtype=jnp.bfloat16,
)
print(f"[5] GMG 8M setup (coeff bf16): {time.time()-t0:.0f}s", flush=True)
A8c = csr_to_dia(a8, dtype=np.float32, grid=(200, 200, 200))
A8_64 = csr_to_dia(a8, dtype=np.float64, grid=(200, 200, 200))
b8_64 = jnp.asarray(np.ones(n8))
ref8 = jax.jit(
    lambda A64_, A_, M_, bb: refine_device(
        A64_, bb,
        lambda r: pcg(A_, r, M=M_, tol=1e-5, maxiter=60,
                      true_residual=False),
        tol=1e-8, max_outer=6,
    )
)
f = lambda: float(ref8(A8_64, A8c, pc8, b8_64)[1].outer_iterations)
f()
best = 1e9
for _ in range(3):
    t1 = time.time()
    f()
    best = min(best, time.time() - t1)
xr8, st8 = ref8(A8_64, A8c, pc8, b8_64)
a8_sp = sp.csr_matrix(
    (a8.data.astype(np.float64), a8.indices, a8.indptr), shape=a8.shape
)
rel = float(np.linalg.norm(np.asarray(b8_64) - a8_sp @ np.asarray(xr8))
            / np.sqrt(n8))
print(f"[5] config4 8M refined bf16-GMG: {best*1e3:.0f} ms "
      f"(outer={int(st8.outer_iterations)}, inner={int(st8.inner_iterations)}, "
      f"host_rel={rel:.2e})", flush=True)
del pc8

# 6. fixed ca_gmres chained-solve metric
from kryst_tpu.solvers.ca_gmres import ca_gmres

b8 = jnp.ones(n8, jnp.float32)
f_its = jax.jit(
    lambda A, bb: ca_gmres(A, bb, tol=0.0, maxiter=60, restart=30)[1].iterations
)
its_ca = int(f_its(A8c, b8))

def mk_ca(nrep):
    def f_impl(A, bb):
        def step(carry, _):
            x, _s = ca_gmres(A, carry, tol=0.0, maxiter=60, restart=30)
            return carry + 1e-6 * x, None

        return jnp.sum(lax.scan(step, bb, None, length=nrep)[0])

    f = jax.jit(f_impl)
    return lambda: f(A8c, b8)

dt_solve = slope(mk_ca, 1, 3, reps=2)
print(f"[6] ca_gmres 8M: {dt_solve/max(its_ca,1)*1e3:.2f} ms/iter "
      f"({its_ca} its/solve)", flush=True)
print("R4 STAGE 2 DONE", flush=True)
