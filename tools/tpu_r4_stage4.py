"""Round-4 stage 4: block-kernel output-DMA fix candidates.

Stage 3's copy-through probe showed the ~6x gap is pure data movement,
independent of kernel body, VMEM budget, and 2-D vs 3-D indexing — and
LINEAR in k (~0.72 ms/column at 8M; 123 grid steps x k plane-writes x
~6 us of serialized DMA latency fits the measurements). Hypothesis: the
3-D output block (k, bm, 128) at (z, i, z) is k strided per-plane DMAs
that Mosaic cannot pipeline the way it pipelines the single-vector
kernel's 2-D (bm, 128) output stream.

Variants (all bitwise-checked against the current kernel):
  V1 interleaved: one contiguous (k*bm, 128) out block per step +
     one XLA transpose to reassemble (k, n);
  V2 k separate 2-D outputs (each its own pipelined stream) + stack;
  V3 V1 without the reassembly transpose (raw (nblk, k, bm, 128)) —
     kernel-only cost, the number a native interleaved solver layout
     would see.
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


def _compute_cols(offsets, bm, margin, k, x_ref, c):
    """Shared per-column compute: the current kernel's shifted-window sum."""
    import jax.experimental.pallas as pl
    import jax.lax as lax_
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    i0 = i * bm
    lane = lax_.broadcasted_iota(jnp.int32, (bm, 128), 1)
    W0 = x_ref[c, pl.ds(i0, bm + 2 * margin), :]
    acc = None
    for kd, off in enumerate(offsets):
        q, r = divmod(off, 128)
        base = margin + q
        if r:
            W = W0[base : base + bm + 1]
            W1 = pltpu.roll(W, jnp.int32(128 - r), axis=1)
            Y = jnp.where(lane < 128 - r, W1[:bm], W1[1 : bm + 1])
        else:
            Y = W0[base : base + bm]
        # dummy d_ref access happens in caller; here multiply-less copy to
        # keep this helper shape-only
        acc = Y if acc is None else acc + Y
    return acc


def call_variant(mode, data_blk, offsets, Xk, plan):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k, n = Xk.shape
    bm, margin, mpad = plan.block_rows, plan.margin, plan.mpad
    ndiag = len(offsets)
    npad = mpad * 128
    nblk = plan.nblk
    Xp = jnp.pad(Xk, ((0, 0), (0, npad - n))).reshape(k, mpad, 128)
    Xp = jnp.pad(Xp, ((0, 0), (margin, margin), (0, 0)))
    isz = Xk.dtype.itemsize
    rows_budget = _X_VMEM_BUDGET_BYTES // (128 * isz * k)
    cblk = max(1, (rows_budget - 2 * margin) // bm)
    z = np.int32(0)

    def body_full(x_ref, d_ref, *o_refs):
        import jax.experimental.pallas as pl
        import jax.lax as lax_
        from jax.experimental.pallas import tpu as pltpu

        i = pl.program_id(0)
        i0 = i * bm
        lane = lax_.broadcasted_iota(jnp.int32, (bm, 128), 1)
        for c in range(k):
            W0 = x_ref[c, pl.ds(i0, bm + 2 * margin), :]
            acc = None
            for kd, off in enumerate(offsets):
                q, r = divmod(off, 128)
                base = margin + q
                if r:
                    W = W0[base : base + bm + 1]
                    W1 = pltpu.roll(W, jnp.int32(128 - r), axis=1)
                    Y = jnp.where(lane < 128 - r, W1[:bm], W1[1 : bm + 1])
                else:
                    Y = W0[base : base + bm]
                term = d_ref[kd * bm : (kd + 1) * bm] * Y
                acc = term if acc is None else acc + term
            if mode == "inter":
                o_refs[0][c * bm : (c + 1) * bm] = acc
            elif mode == "multi":
                o_refs[c][...] = acc
            else:
                raise AssertionError(mode)

    outs = []
    for b0 in range(0, nblk, cblk):
        nb = min(cblk, nblk - b0)
        Xw = jax.lax.dynamic_slice_in_dim(Xp, b0 * bm, nb * bm + 2 * margin, axis=1)
        Dw = jax.lax.dynamic_slice_in_dim(
            data_blk, b0 * ndiag * bm, nb * ndiag * bm
        )
        in_specs = [
            pl.BlockSpec((k, nb * bm + 2 * margin, 128),
                         lambda i: (z, z, z), memory_space=pltpu.VMEM),
            pl.BlockSpec((ndiag * bm, 128), lambda i: (i, z),
                         memory_space=pltpu.VMEM),
        ]
        if mode == "inter":
            out_specs = pl.BlockSpec((k * bm, 128), lambda i: (i, z),
                                     memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((nb * k * bm, 128), Xk.dtype)
        else:
            out_specs = tuple(
                pl.BlockSpec((bm, 128), lambda i: (i, z),
                             memory_space=pltpu.VMEM)
                for _ in range(k)
            )
            out_shape = tuple(
                jax.ShapeDtypeStruct((nb * bm, 128), Xk.dtype)
                for _ in range(k)
            )
        y = pl.pallas_call(
            body_full,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(Xw, Dw)
        outs.append(y)
    if mode == "inter":
        raw = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        return raw  # (nblk*k*bm, 128) interleaved
    # multi: k tuples per chunk
    cols = []
    for c in range(k):
        parts = [o[c] for o in outs]
        cols.append(parts[0] if len(parts) == 1 else jnp.concatenate(parts))
    return jnp.stack(cols)  # (k, mpad, 128)


def assemble_inter(raw, k, bm, mpad, npad, n):
    Y = raw.reshape(mpad // bm, k, bm, 128).transpose(1, 0, 2, 3)
    return Y.reshape(k, npad)[:, :n]


t0 = time.time()
a8 = gallery.poisson_3d(200)
n8 = 200 ** 3
A8 = csr_to_dia(a8, dtype=np.float32)
print(f"8M assembly {time.time()-t0:.0f}s", flush=True)
rng = np.random.default_rng(0)
k = 8
Xk = jnp.asarray(rng.standard_normal((k, n8)).astype(np.float32))
plan = A8.plan
bm, mpad = plan.block_rows, plan.mpad
npad = mpad * 128

# correctness
ref = jax.jit(lambda A, X: dia_spmv_planned_cols(A.data_blk, A.offsets, X, A.plan))(A8, Xk)
v1 = jax.jit(lambda A, X: assemble_inter(
    call_variant("inter", A.data_blk, A.offsets, X, A.plan), k, bm, mpad, npad, n8))(A8, Xk)
v2 = jax.jit(lambda A, X: call_variant("multi", A.data_blk, A.offsets, X, A.plan)
             .reshape(k, npad)[:, :n8])(A8, Xk)
print("V1 max|diff|", float(jnp.max(jnp.abs(v1 - ref))), flush=True)
print("V2 max|diff|", float(jnp.max(jnp.abs(v2 - ref))), flush=True)
del ref, v1, v2


def fslope(fn, label, lo=8, hi=24):
    def mk(it):
        f = jax.jit(
            lambda A, X, it=it: lax.fori_loop(
                0, it, lambda t, Xc: fn(A, Xc) * 0.12, X
            )[0, 0]
        )
        return lambda: f(A8, Xk)

    dt = slope(mk, lo, hi, reps=2)
    print(f"{label}: {dt*1e3:.3f} ms/call", flush=True)
    return dt


fslope(lambda A, X: dia_spmv_planned_cols(A.data_blk, A.offsets, X, A.plan),
       "[V0] current 3-D out")
fslope(lambda A, X: assemble_inter(
    call_variant("inter", A.data_blk, A.offsets, X, A.plan),
    k, bm, mpad, npad, n8), "[V1] interleaved + transpose")
fslope(lambda A, X: call_variant("multi", A.data_blk, A.offsets, X, A.plan)
       .reshape(k, npad)[:, :n8], "[V2] k separate outputs + stack")

# V3: kernel-only (raw interleaved out, fold back via cheap reduce to keep
# the loop carrier shaped (k, n): slice one lane block instead of transpose)
def v3_fn(A, X):
    raw = call_variant("inter", A.data_blk, A.offsets, X, A.plan)
    # fold raw back into (k, n) WITHOUT the transpose cost: broadcast one
    # bm-row stripe across the carrier (keeps shapes static; NOT the real
    # result — timing probe only)
    stripe = raw[: k * bm].reshape(k, bm * 128)
    return jnp.tile(stripe, (1, npad // (bm * 128)))[:, :n8]

fslope(v3_fn, "[V3] interleaved, no transpose (kernel-only)")
print("R4 STAGE 4 DONE", flush=True)
