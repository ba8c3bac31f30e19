"""Round-4 stage 3: block-kernel DMA-vs-compute split + cheb V-cycle puzzle.

Stage 2 eliminated transposes / rolls / 3-D indexing as causes of the
block kernel's ~6x gap (0.72 ms marginal per column = ~90 GB/s). Here:
  1. copy-through kernel (same specs/grid/chunking, body just copies the
     k center windows to the output) — isolates DMA/launch cost from the
     per-offset VPU work;
  2. single-offset kernel (one diagonal, offset 0) — the cheapest
     compute that still reads every window;
  3. x_budget sweep (default 48 MB vs 90 MB) — chunk-count sensitivity;
  4. re-measure the 1M chebyshev-vs-jacobi V-cycle discrepancy
     back-to-back in one process (stage-1 ordering may have aliased a
     compile/cache effect into the chebyshev number).
"""
import functools
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax import lax

from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import csr_to_dia
from kryst_tpu.ops.streamed import _X_VMEM_BUDGET_BYTES, dia_spmv_planned_cols

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


def variant_call(kern_body, data_blk, offsets, Xk, plan, budget=None,
                 ndiag_used=None):
    """Same chunking/specs as dia_spmv_planned_cols, custom kernel body."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k, n = Xk.shape
    bm, margin, mpad = plan.block_rows, plan.margin, plan.mpad
    ndiag = ndiag_used if ndiag_used is not None else len(offsets)
    npad = mpad * 128
    nblk = plan.nblk
    Xp = jnp.pad(Xk, ((0, 0), (0, npad - n))).reshape(k, mpad, 128)
    Xp = jnp.pad(Xp, ((0, 0), (margin, margin), (0, 0)))
    isz = Xk.dtype.itemsize
    budget = budget or _X_VMEM_BUDGET_BYTES
    rows_budget = budget // (128 * isz * k)
    cblk = max(1, (rows_budget - 2 * margin) // bm)
    z = np.int32(0)
    outs = []
    for b0 in range(0, nblk, cblk):
        nb = min(cblk, nblk - b0)
        Xw = jax.lax.dynamic_slice_in_dim(Xp, b0 * bm, nb * bm + 2 * margin, axis=1)
        Dw = jax.lax.dynamic_slice_in_dim(
            data_blk, b0 * len(offsets) * bm, nb * len(offsets) * bm
        )
        y = pl.pallas_call(
            functools.partial(kern_body, offsets, bm, margin, k),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((k, nb * bm + 2 * margin, 128),
                             lambda i: (z, z, z), memory_space=pltpu.VMEM),
                pl.BlockSpec((len(offsets) * bm, 128), lambda i: (i, z),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((k, bm, 128), lambda i: (z, i, z),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k, nb * bm, 128), Xk.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(Xw, Dw)
        outs.append(y)
    Y = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return Y.reshape(k, npad)[:, :n]


def copy_body(offsets, bm, margin, k, x_ref, d_ref, o_ref):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    i0 = i * bm
    for c in range(k):
        o_ref[c] = x_ref[c, pl.ds(i0 + margin, bm), :]


def one_diag_body(offsets, bm, margin, k, x_ref, d_ref, o_ref):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    i0 = i * bm
    for c in range(k):
        W = x_ref[c, pl.ds(i0 + margin, bm), :]
        o_ref[c] = d_ref[0 * bm : 1 * bm] * W


t0 = time.time()
a8 = gallery.poisson_3d(200)
n8 = 200 ** 3
A8 = csr_to_dia(a8, dtype=np.float32)
print(f"8M assembly {time.time()-t0:.0f}s", flush=True)
rng = np.random.default_rng(0)
k = 8
Xk = jnp.asarray(rng.standard_normal((k, n8)).astype(np.float32))


def fslope(fn, label):
    def mk(it):
        f = jax.jit(
            lambda A, X, it=it: lax.fori_loop(
                0, it, lambda t, Xc: fn(A, Xc) * 0.12, X
            )[0, 0]
        )
        return lambda: f(A8, Xk)

    dt = slope(mk, 8, 24, reps=2)
    print(f"{label}: {dt*1e3:.3f} ms/call", flush=True)
    return dt


jit_copy = jax.jit(
    lambda A, X: variant_call(copy_body, A.data_blk, A.offsets, X, A.plan)
)
jit_1d = jax.jit(
    lambda A, X: variant_call(one_diag_body, A.data_blk, A.offsets, X, A.plan)
)
jit_big = jax.jit(
    lambda A, X: dia_spmv_planned_cols(
        A.data_blk, A.offsets, X, A.plan,
        x_budget_bytes=90 * 1024 * 1024,
    )
)
fslope(lambda A, X: jit_copy(A, X), "[1] copy-through k=8")
fslope(lambda A, X: jit_1d(A, X), "[2] one-diagonal k=8")
fslope(
    lambda A, X: dia_spmv_planned_cols(A.data_blk, A.offsets, X, A.plan),
    "[0] full kernel  k=8 (48MB budget)",
)
fslope(lambda A, X: jit_big(A, X), "[3] full kernel  k=8 (90MB budget)")
del Xk

# 4. cheb-vs-jacobi V-cycle at 1M, interleaved measurement
from kryst_tpu.pc.gmg import GMGPC

a1 = gallery.poisson_3d(100)
n1 = 100 ** 3
r1 = jnp.asarray(rng.standard_normal(n1).astype(np.float32))

def vs(pc, label):
    def mk(it):
        f = jax.jit(
            lambda M, rr, it=it: jnp.sum(
                lax.fori_loop(0, it, lambda i, u: M.apply(u) / 1.0001, rr)
            )
        )
        return lambda: f(pc, r1)

    dt = slope(mk, 20, 60, reps=3)
    print(f"[4] V-cycle 1M {label}: {dt*1e3:.3f} ms", flush=True)

pc_j = GMGPC.setup(a1, grid=(100,)*3, nu_pre=2, nu_post=2,
                   dtype=np.float32, smoother="jacobi")
pc_c = GMGPC.setup(a1, grid=(100,)*3, nu_pre=2, nu_post=2,
                   dtype=np.float32, smoother="chebyshev")
vs(pc_j, "jacobi  (1st)")
vs(pc_c, "chebyshev (1st)")
vs(pc_j, "jacobi  (2nd)")
vs(pc_c, "chebyshev (2nd)")

# 5. 8M GMG setup wall after the relay-fetch fix (blk_dtype threaded into
# construction; was 372 s with 4x ~130 s device->host panel fetches)
del pc_j, pc_c, A8
t0 = time.time()
pc8 = GMGPC.setup(a8, grid=(200,) * 3, nu_pre=2, nu_post=2,
                  dtype=np.float32, coeff_dtype=jnp.bfloat16)
print(f"[5] GMG 8M setup (coeff bf16, post-fix): {time.time()-t0:.0f}s",
      flush=True)
r8 = jnp.asarray(rng.standard_normal(n8).astype(np.float32))
def v8(it):
    f = jax.jit(lambda M, rr, it=it: jnp.sum(
        lax.fori_loop(0, it, lambda i, u: M.apply(u) / 1.0001, rr)))
    return lambda: f(pc8, r8)
dt = slope(v8, 8, 24, reps=2)
print(f"[5] V-cycle 8M bf16 (post-fix sanity): {dt*1e3:.3f} ms", flush=True)
print("R4 STAGE 3 DONE", flush=True)
