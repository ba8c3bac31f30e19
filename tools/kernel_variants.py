"""Experimental multi-vector streamed-SpMV variants (round-4 diagnosis).

The production block kernel (ops/streamed.py::dia_spmv_planned_cols)
measured 5.92 ms/call at 8M k=8 vs a 0.96 ms traffic bound even after
the layout transposes were removed — the cost is inside the kernel.
These variants isolate candidate causes; tools/tpu_r4_stage2.py measures
them on the chip.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from kryst_tpu.ops.streamed import _X_VMEM_BUDGET_BYTES, DIAPlan


def _flat_kernel(offsets, bm, margin, k, rows_pc, x_ref, d_ref, o_ref):
    """2-D flattened X: column c occupies rows [c*rows_pc, (c+1)*rows_pc)
    of a (k*rows_pc, 128) ref — every slice is 2-D, like the proven
    single-vector kernel (no 3-D ref indexing)."""
    import jax.experimental.pallas as pl
    import jax.lax as lax_
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    i0 = i * bm
    lane = lax_.broadcasted_iota(jnp.int32, (bm, 128), 1)
    for c in range(k):
        W0 = x_ref[pl.ds(c * rows_pc + i0, bm + 2 * margin), :]
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
        o_ref[pl.ds(c * bm, bm), :] = acc


@functools.partial(
    jax.jit, static_argnames=("offsets", "plan", "x_budget_bytes")
)
def cols_flat(data_blk, offsets, Xk, plan, *, x_budget_bytes=None):
    """Flattened-2-D variant of dia_spmv_planned_cols."""
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
    budget = x_budget_bytes or _X_VMEM_BUDGET_BYTES
    rows_budget = budget // (128 * isz * k)
    cblk = max(1, (rows_budget - 2 * margin) // bm)
    z = np.int32(0)
    outs = []
    for b0 in range(0, nblk, cblk):
        nb = min(cblk, nblk - b0)
        rows_pc = nb * bm + 2 * margin
        Xw = jax.lax.dynamic_slice_in_dim(Xp, b0 * bm, rows_pc, axis=1)
        Xw2 = Xw.reshape(k * rows_pc, 128)
        Dw = jax.lax.dynamic_slice_in_dim(
            data_blk, b0 * ndiag * bm, nb * ndiag * bm
        )
        kern = functools.partial(
            _flat_kernel, offsets, bm, margin, k, rows_pc
        )
        y = pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((k * rows_pc, 128), lambda i: (z, z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ndiag * bm, 128), lambda i: (i, z),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((k * bm, 128), lambda i: (i, z),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb * k * bm, 128), Xk.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(Xw2, Dw)
        # output block i holds columns interleaved: (nb, k, bm, 128)
        outs.append(y.reshape(nb, k, bm, 128))
    Y = jnp.concatenate(outs, axis=0)  # (nblk, k, bm, 128)
    Y = jnp.moveaxis(Y, 1, 0).reshape(k, npad)
    return Y[:, :n]


def cols_rowloop(A, Xk):
    """Per-row loop of single-vector planned matvecs: each row of the
    (k, n) block is CONTIGUOUS, so each call runs at single-matvec speed;
    panels re-stream k times (cheap when panels are bf16)."""
    from kryst_tpu.ops.streamed import dia_spmv_planned

    return jnp.stack(
        [
            dia_spmv_planned(A.data_blk, A.offsets, Xk[j], A.plan)
            for j in range(Xk.shape[0])
        ]
    )
