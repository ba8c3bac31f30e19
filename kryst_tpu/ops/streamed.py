"""Grid-streamed DIA SpMV for beyond-VMEM problem sizes.

BELOW the VMEM-residency threshold (~96 MB working set; v5e VMEM is
128 MB) the XLA shifted-slice form in ops/dia.py wins outright: XLA keeps
coefficients and Krylov vectors VMEM-resident across while_loop
iterations (17 us / 2+ TB/s effective at 1M dof, measured) and any
pallas_call boundary would force an HBM round-trip. ABOVE it XLA's form
craters (79 GB/s at 8M dof, measured) because the concatenate chains
materialize in HBM. This module is the above-threshold path.

The kernel keeps (a window of) x resident in VMEM and STREAMS the
coefficient panels through VMEM block by block via the grid. Two facts
bought the bandwidth (all measured at 8M dof on v5e):

- **Coefficient layout is everything.** Streaming D blocks out of the
  canonical (ndiag, n) planes is a 7-way strided DMA per block: 155 GB/s.
  Re-laying D out so each block's panel is one CONTIGUOUS (ndiag*bm, 128)
  stream: 769 GB/s — the full measured HBM roofline. The re-layout MUST
  happen once, outside the solver loop (``plan_dia``): done inside the
  jitted matvec it is NOT hoisted out of while_loops and its ~450 MB of
  hidden traffic caps the kernel at 155 GB/s regardless of layout.
- **One aligned window per block.** Per-offset shifts are static slices
  of a materialized (bm+2·margin, 128) window (sublane shifts), not
  per-offset misaligned dynamic slices of the ref.

Shift convention (matches ops/dia.py): y[j] = sum_d data[d, j] *
x[j + off_d]; viewing x as (rows, 128) lanes, off = q*128 + r maps
output row t to input rows t+q (lanes < 128-r after a lane roll by -r)
and t+q+1 (wrapped lanes). x is zero-padded with ``margin`` rows top and
bottom so every window read is in bounds and out-of-range terms are
exact zeros.

The optional fused <x, Ax> partial accumulates into an SMEM (1,1) output
with a constant index map — sequential TPU grid steps make the
read-modify-write safe.

Mosaic's scoped-VMEM limit defaults to 16 MB — far below the 128 MB
physical VMEM — so ``vmem_limit_bytes`` is sized from the actual buffers
(measured OOM without this at 8M dof).

Reference: the SpMV this replaces densifies on the reference side
(src/matrix/sparse.rs:56-67); every GB/s here is a genuine win over it.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def _on_cpu() -> bool:
    return jax.default_backend() == "cpu"


# Budget for the VMEM-resident x window inside the kernel. v5e VMEM is
# 128 MB; leave room for double-buffered coefficient panels, the output
# block, and shift temporaries.
_X_VMEM_BUDGET_BYTES = 48 * 1024 * 1024


class DIAPlan(NamedTuple):
    """Static metadata of a pre-blocked coefficient layout (see plan_dia)."""

    block_rows: int
    margin: int
    mpad: int

    @property
    def nblk(self) -> int:
        return self.mpad // self.block_rows


def _plan_geometry(n: int, offsets, block_rows: int) -> DIAPlan:
    m = -(-n // 128)
    # f32 sublane tile is 8 rows: i0 = i*bm and the block shapes must stay
    # multiples of 8 or Mosaic block specs misalign (advisor round 2).
    block_rows = -(-block_rows // 8) * 8
    block_rows = min(block_rows, -(-m // 8) * 8)  # don't pad small ops 4x
    mpad = -(-m // block_rows) * block_rows
    qs = [divmod(off, 128)[0] for off in offsets]
    margin = max(max(q + 1 for q in qs), max(-q for q in qs), 8)
    margin = -(-margin // 8) * 8
    return DIAPlan(block_rows, margin, mpad)


def auto_block_rows(ndiag: int, itemsize: int = 4) -> int:
    """Largest block size whose double-buffered coefficient panel fits the
    VMEM budget: 2 * ndiag * bm * 128 * itemsize <= ~48 MB. Many-diagonal
    operators (AMG/GMG coarse levels, 100+ diagonals) need small blocks."""
    bm = 1024
    while bm > 8 and 2 * ndiag * bm * 128 * itemsize > 48 * 1024 * 1024:
        bm //= 2
    return bm


def plan_dia(
    data: np.ndarray, offsets: Tuple[int, ...], block_rows: int = 0,
    blk_dtype=None,
) -> Tuple[np.ndarray, DIAPlan]:
    """Blocked-flat coefficient layout for the streaming kernel.

    Returns ``(data_blk, plan)`` where ``data_blk`` has shape
    ``(nblk*ndiag*block_rows, 128)``: block i's panel is the contiguous
    row range ``[i*ndiag*bm, (i+1)*ndiag*bm)`` with diagonal k at panel
    rows ``[k*bm, (k+1)*bm)``. Call ONCE at operator construction (host
    side): computing this inside a jitted matvec is not hoisted out of
    solver while_loops and costs ~3x the kernel's own traffic.

    ``blk_dtype``: store the panels in a lower precision (e.g. bf16 —
    halves the dominant coefficient stream; the kernel's multiply
    promotes back to x's dtype). Use only where an approximate operator
    is acceptable: preconditioner internals (GMG/AMG levels), or inner
    solves wrapped by f64 refinement.
    """
    import jax.numpy as _jnp

    data = np.asarray(data)
    if blk_dtype is not None:
        # Convert ON THE HOST (numpy understands ml_dtypes such as
        # jnp.bfloat16): routing through jnp.asarray would allocate the
        # full panel array on the device — a ~336 MB relay round-trip
        # per 8M-dof level on this backend's remote TPU.
        data = data.astype(_jnp.dtype(blk_dtype))
    ndiag, n = data.shape
    if not block_rows:
        block_rows = auto_block_rows(ndiag, data.dtype.itemsize)
    plan = _plan_geometry(n, offsets, block_rows)
    if data.dtype.itemsize < 4 and plan.block_rows % 16:
        # bf16 sublane tile is 16 rows; the tiny-operator clamp can give 8
        bm16 = -(-plan.block_rows // 16) * 16
        plan = DIAPlan(bm16, plan.margin, -(-plan.mpad // bm16) * bm16)
    bm, mpad = plan.block_rows, plan.mpad
    npad = mpad * 128
    nblk = plan.nblk
    d = np.zeros((ndiag, npad), dtype=data.dtype)
    d[:, :n] = np.asarray(data)
    d = (
        d.reshape(ndiag, nblk, bm, 128)
        .transpose(1, 0, 2, 3)
        .reshape(nblk * ndiag * bm, 128)
    )
    return np.ascontiguousarray(d), plan


def _streamed_kernel(offsets, bm, margin, with_dot, smooth_omega, shifted,
                     *refs):
    import jax.experimental.pallas as pl
    import jax.lax as lax_
    from jax.experimental.pallas import tpu as pltpu

    # ref layout: x, d [, r, dinv | up, sc] -> out [, dot]
    x_ref, d_ref = refs[0], refs[1]
    if smooth_omega is not None:
        r_ref, di_ref = refs[2], refs[3]
        o_ref, rest = refs[4], refs[5:]
    elif shifted:
        up_ref, sc_ref = refs[2], refs[3]
        o_ref, rest = refs[4], refs[5:]
    else:
        o_ref, rest = refs[2], refs[3:]

    i = pl.program_id(0)
    i0 = i * bm
    lane = lax_.broadcasted_iota(jnp.int32, (bm, 128), 1)
    # ONE aligned dynamic window per block (i0 is a multiple of bm and
    # margin of 8, so the slice start is sublane-aligned); the per-offset
    # shifts below are then STATIC slices of a materialized value, which
    # Mosaic lowers to cheap sublane shifts instead of per-offset
    # misaligned VMEM copies.
    W0 = x_ref[pl.ds(i0, bm + 2 * margin), :]
    acc = None
    for k, off in enumerate(offsets):
        q, r = divmod(off, 128)
        base = margin + q
        if r:
            W = W0[base : base + bm + 1]
            W1 = pltpu.roll(W, jnp.int32(128 - r), axis=1)  # lane l <- lane (l+r) % 128
            Y = jnp.where(lane < 128 - r, W1[:bm], W1[1 : bm + 1])
        else:
            Y = W0[base : base + bm]
        # d_ref is this block's flat panel (ndiag*bm, 128): diag k at rows
        # [k*bm, (k+1)*bm). One CONTIGUOUS stream (769 GB/s vs 155 GB/s
        # for the strided (ndiag, bm, 128) block DMA, measured).
        term = d_ref[k * bm : (k + 1) * bm] * Y
        acc = term if acc is None else acc + term
    xdot = None
    if smooth_omega is not None:
        # fused damped-Jacobi epilogue: out = x + omega * dinv * (r - A x).
        # Saves the separate elementwise HBM pass a pallas_call boundary
        # would otherwise force on the smoothing update (VERDICT r2 item 2).
        xc = W0[margin : margin + bm]
        o_ref[...] = xc + smooth_omega * di_ref[...] * (r_ref[...] - acc)
    elif shifted:
        # fused shifted-recurrence epilogue (CA-GMRES Newton basis):
        # out = (A x - re * x + imsq * x_prev) * inv_gamma — the basis
        # step in the SAME pass as the SpMV (the separate XLA pass reads
        # A x + x + x_prev and writes w: ~128 MB/step at 8M dof).
        # Scalars ride SMEM because they are per-step TRACED values
        # (Newton shifts are computed on device).
        xc = W0[margin : margin + bm]
        out = (acc - sc_ref[0, 0] * xc + sc_ref[0, 1] * up_ref[...]) * sc_ref[0, 2]
        o_ref[...] = out
        # with_dot below then accumulates sum(w*w) — the basis step's
        # equilibration norm — instead of <x, A x>
        acc = out
        xdot = out
    else:
        o_ref[...] = acc
    if with_dot:
        acc_ref = rest[0]
        xc = xdot if xdot is not None else W0[margin : margin + bm]
        partial = jnp.sum(xc * acc)

        @pl.when(i == 0)
        def _():
            acc_ref[0, 0] = partial

        @pl.when(i > 0)
        def _():
            acc_ref[0, 0] = acc_ref[0, 0] + partial


def _streamed_block_kernel(offsets, bm, margin, k, x_ref, d_ref, o_ref):
    """Multi-vector variant: one coefficient-panel stream for ALL k columns.

    The k-column block (e.g. (8M, 8) f32 = 256 MB) cannot sit VMEM-resident
    like the single-vector kernel's x, so the caller chunks the grid so that
    k windows fit the budget together; within a grid step the d panel is
    VMEM-resident and reused across the (statically unrolled) column loop —
    coefficient traffic is paid ONCE per block instead of once per column
    (the dominant term for multi-diagonal operators: 7-point at 8M dof
    re-reads 224 MB per extra column on the per-column path).
    """
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
        o_ref[c] = acc


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "plan", "interpret", "x_budget_bytes"),
)
def dia_spmv_planned_block(
    data_blk: Array,
    offsets: Tuple[int, ...],
    X: Array,
    plan: DIAPlan,
    *,
    interpret: bool = False,
    x_budget_bytes: Optional[int] = None,
):
    """Y = A @ X for an (n, k) column block from the pre-blocked layout.

    The ROADMAP 0b kernel: beyond-VMEM block solvers (block_pcg /
    block_gmres) previously unrolled the single-vector streamed kernel per
    column, re-reading the coefficient panels k times. Here each chunk's
    panel slice streams once for all k columns; X is tiled with halo
    margins per chunk (k windows share the VMEM budget, so chunks are ~k×
    smaller — same total X traffic, one panel pass).

    NB: the (n, k) entry transposes to the kernel's column-plane layout
    on the way in AND out — two strided 256 MB passes at 8M k=8 that
    measured ~4.5x the kernel's own cost (round 3: 6.76 ms/call vs the
    1.13 ms traffic bound). Hot paths should carry (k, n) blocks and call
    :func:`dia_spmv_planned_cols` directly (zero layout moves)."""
    Y = dia_spmv_planned_cols(
        data_blk, offsets, X.T, plan,
        interpret=interpret, x_budget_bytes=x_budget_bytes,
    )
    return Y.T


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "plan", "interpret", "x_budget_bytes"),
)
def dia_spmv_planned_cols(
    data_blk: Array,
    offsets: Tuple[int, ...],
    Xk: Array,
    plan: DIAPlan,
    *,
    interpret: bool = False,
    x_budget_bytes: Optional[int] = None,
):
    """Y = A @ X for X supplied as (k, n) ROWS-of-columns (each row one
    RHS vector), returning (k, n).

    The transpose-free core of :func:`dia_spmv_planned_block`: a (k, n)
    block pads/reshapes CONTIGUOUSLY into the kernel's (k, rows, 128)
    column planes, so the only HBM traffic is the kernel's own streams
    (panels once + k·(x + y)). The block solvers carry their multivector
    state in this layout for exactly this reason."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k, n = Xk.shape
    bm, margin, mpad = plan.block_rows, plan.margin, plan.mpad
    ndiag = len(offsets)
    npad = mpad * 128
    nblk = plan.nblk
    # (k, n) -> k padded (rows, 128) planes with halo margins: pure
    # reshape + zero-pad, no transpose
    Xp = jnp.pad(Xk, ((0, 0), (0, npad - n))).reshape(k, mpad, 128)
    Xp = jnp.pad(Xp, ((0, 0), (margin, margin), (0, 0)))
    X = Xk  # for dtype/budget bookkeeping below

    isz = X.dtype.itemsize
    budget = x_budget_bytes or _X_VMEM_BUDGET_BYTES
    rows_budget = budget // (128 * isz * k)
    cblk = max(1, (rows_budget - 2 * margin) // bm)
    z = np.int32(0)
    outs = []
    for b0 in range(0, nblk, cblk):
        nb = min(cblk, nblk - b0)
        Xw = jax.lax.dynamic_slice_in_dim(Xp, b0 * bm, nb * bm + 2 * margin, axis=1)
        Dw = jax.lax.dynamic_slice_in_dim(
            data_blk, b0 * ndiag * bm, nb * ndiag * bm
        )
        kern = functools.partial(
            _streamed_block_kernel, offsets, bm, margin, k
        )
        vmem_bytes = (
            k * (nb * bm + 2 * margin) * 128 * isz  # resident X windows
            + 2 * ndiag * bm * 128 * isz  # double-buffered panels
            + 2 * k * bm * 128 * isz  # double-buffered output blocks
            + 4 * (bm + 2 * margin) * 128 * isz  # shift temporaries
            + (8 << 20)
            + ndiag * bm * 128 * isz // 4
        )
        y = pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(
                    (k, nb * bm + 2 * margin, 128),
                    lambda i: (z, z, z),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (ndiag * bm, 128), lambda i: (i, z), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (k, bm, 128), lambda i: (z, i, z), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((k, nb * bm, 128), X.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(int(vmem_bytes), 100 * 1024 * 1024)
            ),
            interpret=interpret,
        )(Xw, Dw)
        outs.append(y)
    Y = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return Y.reshape(k, npad)[:, :n]


def interleave_cols(Xk: Array, plan: DIAPlan) -> Array:
    """(k, n) multivector -> the block-interleaved carrier layout.

    Layout: logical (nblk + 2, k, bm, 128) flattened to rows x 128 —
    block-major, column within block, with one ZERO halo block at each
    end (so the matvec kernel's tail/head views never leave the array).
    One XLA transpose paid ONCE per solve at entry; inside the solver
    loop every matvec then reads and writes CONTIGUOUS (k*bm, 128)
    blocks, which Mosaic pipelines like the single-vector kernel's 2-D
    stream. The 3-D (k, bm, 128) output blocks of the (k, n) path are k
    strided plane-DMAs per grid step that Mosaic serializes (the
    copy-through kernel cost the same 6 ms as the full kernel at 8M
    k=8 — tools/tpu_r4_stage4.py); the XLA pad/slice/concat copies
    around that path cost a further ~3 ms per call."""
    k, n = Xk.shape
    bm, mpad = plan.block_rows, plan.mpad
    npad = mpad * 128
    nblk = plan.nblk
    Xp = jnp.pad(Xk, ((0, 0), (0, npad - n))).reshape(k, nblk, bm, 128)
    Xi = Xp.transpose(1, 0, 2, 3).reshape(nblk * k * bm, 128)
    return jnp.pad(Xi, ((k * bm, k * bm), (0, 0)))


def deinterleave_cols(Xi: Array, plan: DIAPlan, k: int, n: int) -> Array:
    """Inverse of :func:`interleave_cols`: carrier -> (k, n)."""
    bm, mpad = plan.block_rows, plan.mpad
    nblk = plan.nblk
    body = Xi[k * bm : (nblk + 1) * k * bm]
    Y = body.reshape(nblk, k, bm, 128).transpose(1, 0, 2, 3)
    return Y.reshape(k, mpad * 128)[:, :n]


def interleave_diag(d: Array, plan: DIAPlan) -> Array:
    """Per-position vector (n,) -> (nblk + 2, 1, bm, 128) broadcastable
    against a carrier reshaped to (nblk + 2, k, bm, 128): the carrier's
    column axis is axis 1, so elementwise per-position scalings (Jacobi
    PCs, diagonal weights) broadcast across all k columns. Halo blocks
    get zeros (keeps carriers halo-clean under elementwise ops)."""
    n = d.shape[0]
    bm, mpad = plan.block_rows, plan.mpad
    nblk = plan.nblk
    D = jnp.pad(d, (0, mpad * 128 - n)).reshape(nblk, 1, bm, 128)
    return jnp.pad(D, ((1, 1), (0, 0), (0, 0), (0, 0)))


def _streamed_inter_kernel(offsets, bm, margin, k, nblk, with_gram,
                           *refs):
    """Interleaved-carrier variant: three BLOCK-INDEXED views of the same
    carrier (previous / center / next block — each a contiguous
    (k*bm, 128) pipelined stream) supply column c's window as tail of
    plane (i-1, c) + plane (i, c) + head of plane (i+1, c), then the
    same shifted-slice offset loop as :func:`_streamed_kernel`. Output
    is ONE contiguous (k*bm, 128) block per grid step; grid steps 0 and
    nblk+1 rewrite the carrier's zero halo blocks so the output is a
    valid carrier for the next matvec. Requires margin <= bm.

    ``with_gram`` adds G = X^T (A X) as an SMEM (k, k) output with ZERO
    extra DMA: the center input view is exactly this step's X block and
    the computed output is its A X block (block PCG's T = P^T Q)."""
    import jax.experimental.pallas as pl
    import jax.lax as lax_
    from jax.experimental.pallas import tpu as pltpu

    t_ref, c_ref, h_ref, d_ref = refs[:4]
    o_ref = refs[4]
    g_ref = refs[5] if with_gram else None
    i = pl.program_id(0)
    lane = lax_.broadcasted_iota(jnp.int32, (bm, 128), 1)

    @pl.when(jnp.logical_or(i == 0, i == nblk + 1))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    if with_gram:

        @pl.when(i == 0)
        def _():
            for kk in range(k):
                for q in range(k):
                    g_ref[kk, q] = jnp.zeros((), o_ref.dtype)

    @pl.when(jnp.logical_and(i > 0, i < nblk + 1))
    def _():
        ys = []
        for c in range(k):
            W0 = jnp.concatenate(
                [
                    t_ref[(c + 1) * bm - margin : (c + 1) * bm],
                    c_ref[c * bm : (c + 1) * bm],
                    h_ref[c * bm : c * bm + margin],
                ],
                axis=0,
            )
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
            o_ref[c * bm : (c + 1) * bm] = acc
            if with_gram:
                ys.append(acc)
        if with_gram:
            for kk in range(k):
                x_kk = c_ref[kk * bm : (kk + 1) * bm]
                for q in range(k):
                    g_ref[kk, q] = g_ref[kk, q] + jnp.sum(x_kk * ys[q])


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "plan", "k", "interpret", "with_gram"),
)
def dia_spmv_planned_inter(
    data_blk: Array,
    offsets: Tuple[int, ...],
    Xi: Array,
    plan: DIAPlan,
    k: int,
    *,
    with_gram: bool = False,
    interpret: bool = False,
):
    """Y = A @ X on the block-interleaved carrier (see interleave_cols).

    Carrier in, carrier out, ONE pallas_call — no pad / slice / concat /
    transpose copies inside the solver loop and no whole-window VMEM
    residency (each of the three carrier views is an independently
    pipelined contiguous block stream; X is read 3x, which is far
    cheaper than the serialized plane DMAs + XLA copies of the (k, n)
    path: 6.16 ms -> see bench). Requires plan.margin <=
    plan.block_rows; callers gate via DIAOperator.inter_ok.

    ``with_gram=True`` returns ``(Yi, G)`` with ``G = X^T (A X)`` —
    block PCG's T = P^T Q — accumulated in SMEM from the blocks the
    matvec already has resident, saving a whole carrier_gram pass
    (2 streamed reads of 2 x 268 MB at 8M k=8)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bm, margin = plan.block_rows, plan.margin
    ndiag = len(offsets)
    nblk = plan.nblk
    if margin > bm:
        raise ValueError("interleaved kernel requires margin <= block_rows")
    isz = Xi.dtype.itemsize
    one = np.int32(1)
    z = np.int32(0)
    nb = np.int32(nblk)

    vmem_bytes = (
        6 * k * bm * 128 * isz  # double-buffered tail/center/head blocks
        + 2 * ndiag * bm * 128 * isz  # double-buffered panels
        + 2 * k * bm * 128 * isz  # double-buffered output blocks
        + 4 * (bm + 2 * margin) * 128 * isz  # window + shift temporaries
        + (8 << 20)
        + ndiag * bm * 128 * isz // 4
    )
    out_specs = [
        pl.BlockSpec(
            (k * bm, 128), lambda i: (i, z), memory_space=pltpu.VMEM
        )
    ]
    out_shape = [
        jax.ShapeDtypeStruct(((nblk + 2) * k * bm, 128), Xi.dtype)
    ]
    if with_gram:
        out_specs.append(
            pl.BlockSpec((k, k), lambda i: (z, z), memory_space=pltpu.SMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((k, k), Xi.dtype))
    res = pl.pallas_call(
        functools.partial(
            _streamed_inter_kernel, offsets, bm, margin, k, nblk, with_gram
        ),
        grid=(nblk + 2,),
        in_specs=[
            # previous / center / next carrier blocks; edge steps clamp
            # (their fetches are unused: steps 0 and nblk+1 write zeros)
            pl.BlockSpec(
                (k * bm, 128),
                lambda i: (jnp.maximum(i, one) - one, z),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k * bm, 128), lambda i: (i, z), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k * bm, 128),
                lambda i: (jnp.minimum(i + one, nb + one), z),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ndiag * bm, 128),
                lambda i: (jnp.clip(i - one, z, nb - one), z),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=tuple(out_specs) if with_gram else out_specs[0],
        out_shape=tuple(out_shape) if with_gram else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_bytes), 100 * 1024 * 1024)
        ),
        interpret=interpret,
    )(Xi, Xi, Xi, data_blk)
    return res


def _colmix_kernel(bm, k, scale_diag, v_ref, w_ref, c_ref, d_ref, o_ref):
    """out = (d *) W + sum_k C[k, q] * V_k per carrier block: the block
    solvers' column-mixing axpy (X += P alpha etc.) as one streamed pass.
    The XLA einsum form pays two 256 MB relayout copies per call at 8M
    k=8 (contraction over the carrier's middle axis; ~3.8 ms vs the
    ~1 ms stream bound, measured round 4). Scalar coefficients live in
    SMEM; the k^2 scalar-times-plane FMAs run f32 on the VPU.
    ``scale_diag`` multiplies W by a per-position diagonal — the fused
    Z = M R of a Jacobi PC, so Z is never materialized."""
    for q in range(k):
        acc = w_ref[q * bm : (q + 1) * bm]
        if scale_diag:
            acc = acc * d_ref[...]
        for kk in range(k):
            acc = acc + c_ref[kk, q] * v_ref[kk * bm : (kk + 1) * bm]
        o_ref[q * bm : (q + 1) * bm] = acc


@functools.partial(
    jax.jit, static_argnames=("plan", "k", "interpret", "scale")
)
def carrier_colmix_add(
    V: Array, W: Array, C: Array, plan: DIAPlan, k: int,
    *, diag: Optional[Array] = None, scale: bool = False,
    interpret: bool = False,
) -> Array:
    """(diag *) W + column-mix(C, V) on the block-interleaved carrier:
    ``out[:, q, :] = d * W[:, q, :] + sum_k C[k, q] V[:, k, :]``.
    One streamed pass (2-3 reads + 1 write). ``diag`` uses the
    per-position rows layout (``interleave_diag(...).reshape(-1, 128)``)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bm = plan.block_rows
    nblk = plan.nblk
    isz = V.dtype.itemsize
    z = np.int32(0)
    if scale and diag is None:
        raise ValueError("scale=True requires diag")
    if diag is None:
        diag = jnp.zeros((bm, 128), V.dtype)
        dspec = pl.BlockSpec((bm, 128), lambda i: (z, z),
                             memory_space=pltpu.VMEM)
    else:
        dspec = pl.BlockSpec((bm, 128), lambda i: (i, z),
                             memory_space=pltpu.VMEM)
    vmem_bytes = (6 * k + 4) * bm * 128 * isz + (4 << 20)
    return pl.pallas_call(
        functools.partial(_colmix_kernel, bm, k, scale),
        grid=(nblk + 2,),
        in_specs=[
            pl.BlockSpec((k * bm, 128), lambda i: (i, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * bm, 128), lambda i: (i, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (z, z),
                         memory_space=pltpu.SMEM),
            dspec,
        ],
        out_specs=pl.BlockSpec((k * bm, 128), lambda i: (i, z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((nblk + 2) * k * bm, 128), V.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_bytes), 100 * 1024 * 1024)
        ),
        interpret=interpret,
    )(V, W, C.astype(V.dtype), diag)


def _gram_kernel(bm, k, scale_diag, with_norms, u_ref, v_ref, d_ref,
                 g_ref, *rest):
    """G[k, q] += <U_k, (d *) V_q> per carrier block, accumulated in an
    SMEM (k, k) output across sequential grid steps (same read-modify-
    write pattern as the single-vector kernel's fused dot). ``scale_diag``
    fuses a per-position diagonal (Jacobi) into the right factor so
    gram(R, M R) costs no extra pass; ``with_norms`` adds ||U_k||^2 as a
    second SMEM output in the same data pass (block PCG's per-column
    residual norms)."""
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    for kk in range(k):
        u = u_ref[kk * bm : (kk + 1) * bm]
        if with_norms:
            nrm = jnp.sum(u * u)
            n_ref = rest[0]

            @pl.when(i == 0)
            def _(kk=kk, nrm=nrm, n_ref=n_ref):
                n_ref[kk, 0] = nrm

            @pl.when(i > 0)
            def _(kk=kk, nrm=nrm, n_ref=n_ref):
                n_ref[kk, 0] = n_ref[kk, 0] + nrm
        for q in range(k):
            v = v_ref[q * bm : (q + 1) * bm]
            if scale_diag:
                v = v * d_ref[...]
            partial = jnp.sum(u * v)

            @pl.when(i == 0)
            def _(kk=kk, q=q, partial=partial):
                g_ref[kk, q] = partial

            @pl.when(i > 0)
            def _(kk=kk, q=q, partial=partial):
                g_ref[kk, q] = g_ref[kk, q] + partial


@functools.partial(
    jax.jit,
    static_argnames=("plan", "k", "interpret", "scale", "with_norms"),
)
def carrier_gram(
    U: Array, V: Array, plan: DIAPlan, k: int,
    *, diag: Optional[Array] = None, scale: bool = False,
    with_norms: bool = False, interpret: bool = False,
):
    """G = U^T V on the block-interleaved carrier (column Gram, (k, k)).

    ``diag``/``scale=True``: compute U^T diag(d) V in the same pass —
    d supplied in the per-position carrier-block layout (bm, 128) per
    block, i.e. ``interleave_diag(d, plan)`` reshaped to rows.
    ``with_norms``: also return ||U_k||^2 per column from the same data
    pass ((G, norms2)). The XLA dot_general form pays carrier relayout
    copies (contraction over the middle axis); this is 2 streamed reads
    and no writes."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bm = plan.block_rows
    nblk = plan.nblk
    isz = U.dtype.itemsize
    z = np.int32(0)
    if scale and diag is None:
        raise ValueError("scale=True requires diag")
    if diag is None:
        # tiny dummy so the kernel signature is static
        diag = jnp.zeros((bm, 128), U.dtype)
        dspec = pl.BlockSpec((bm, 128), lambda i: (z, z),
                             memory_space=pltpu.VMEM)
    else:
        dspec = pl.BlockSpec((bm, 128), lambda i: (i, z),
                             memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((k, k), lambda i: (z, z), memory_space=pltpu.SMEM)
    ]
    out_shape = [jax.ShapeDtypeStruct((k, k), U.dtype)]
    if with_norms:
        out_specs.append(
            pl.BlockSpec((k, 1), lambda i: (z, z), memory_space=pltpu.SMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((k, 1), U.dtype))
    vmem_bytes = (4 * k + 4) * bm * 128 * isz + (4 << 20)
    res = pl.pallas_call(
        functools.partial(_gram_kernel, bm, k, scale, with_norms),
        grid=(nblk + 2,),
        in_specs=[
            pl.BlockSpec((k * bm, 128), lambda i: (i, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * bm, 128), lambda i: (i, z),
                         memory_space=pltpu.VMEM),
            dspec,
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_bytes), 100 * 1024 * 1024)
        ),
        interpret=interpret,
    )(U, V, diag)
    if with_norms:
        return res[0], res[1][:, 0]
    return res[0]


def _call_kernel(offsets, bm, margin, with_dot, interpret, Xw, Dw, nb,
                 smooth=None, shift=None):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # index maps return np.int32 zeros: under jax_enable_x64 a literal 0
    # traces as i64 and Mosaic rejects the index fn (func.return (i64,i64))
    ndiag = len(offsets)
    isz = Xw.dtype.itemsize
    omega = None if smooth is None else smooth[2]
    kern = functools.partial(
        _streamed_kernel, offsets, bm, margin, with_dot, omega,
        shift is not None,
    )
    out_shape = [jax.ShapeDtypeStruct((nb * bm, 128), Xw.dtype)]
    out_specs = [
        pl.BlockSpec((bm, 128), lambda i: (i, np.int32(0)), memory_space=pltpu.VMEM)
    ]
    if with_dot:
        out_shape.append(jax.ShapeDtypeStruct((1, 1), Xw.dtype))
        out_specs.append(
            pl.BlockSpec((1, 1), lambda i: (np.int32(0), np.int32(0)), memory_space=pltpu.SMEM)
        )
    vmem_bytes = (
        (nb * bm + 2 * margin) * 128 * isz  # resident x window
        + 2 * ndiag * bm * 128 * isz  # double-buffered coefficient panels
        + 2 * bm * 128 * isz  # double-buffered output block
        + 4 * (bm + 2 * margin) * 128 * isz  # window + shift temporaries
        # slack: Mosaic's stack accounting exceeds the buffer sum, and the
        # excess grows with the unrolled offset loop (measured +3 MB at
        # 179 offsets, bm=256)
        + (8 << 20)
        + ndiag * bm * 128 * isz // 4
    )
    z = np.int32(0)
    in_specs = [
        # x window: resident (whole-array block). The explicit index map
        # matters: a no-block-shape spec under a grid gets a DEFAULT
        # index map whose zeros are i64 under jax_enable_x64, and
        # Mosaic rejects the kernel (func.return (i64, i64)).
        pl.BlockSpec(
            (nb * bm + 2 * margin, 128),
            lambda i: (z, z),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (ndiag * bm, 128), lambda i: (i, z), memory_space=pltpu.VMEM
        ),
    ]
    args = [Xw, Dw]
    if smooth is not None:
        Rw, DIw, _ = smooth
        for extra in (Rw, DIw):
            in_specs.append(
                pl.BlockSpec((bm, 128), lambda i: (i, z), memory_space=pltpu.VMEM)
            )
            args.append(extra)
        vmem_bytes += 4 * bm * 128 * isz  # double-buffered r + dinv blocks
    if shift is not None:
        UPw, SC = shift
        in_specs.append(
            pl.BlockSpec((bm, 128), lambda i: (i, z), memory_space=pltpu.VMEM)
        )
        args.append(UPw)
        in_specs.append(
            pl.BlockSpec((1, 3), lambda i: (z, z), memory_space=pltpu.SMEM)
        )
        args.append(SC)
        vmem_bytes += 2 * bm * 128 * isz  # double-buffered u_prev block
    res = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_bytes), 100 * 1024 * 1024)
        ),
        interpret=interpret,
    )(*args)
    return res if with_dot else res[0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "plan", "with_dot", "smooth_omega", "interpret",
        "x_budget_bytes",
    ),
)
def dia_spmv_planned(
    data_blk: Array,
    offsets: Tuple[int, ...],
    x: Array,
    plan: DIAPlan,
    *,
    with_dot: bool = False,
    smooth_r: Optional[Array] = None,
    smooth_dinv: Optional[Array] = None,
    smooth_omega: Optional[float] = None,
    shift_prev: Optional[Array] = None,
    shift_scalars: Optional[Array] = None,
    interpret: bool = False,
    x_budget_bytes: Optional[int] = None,
):
    """y = A x (optionally with <x, A x>) from a pre-blocked layout.

    Chunks over block ranges when the resident x window would exceed the
    VMEM budget; each chunk's coefficient panel slice is contiguous by
    construction, so chunking costs nothing in layout terms.

    ``smooth_r``/``smooth_dinv``/``smooth_omega`` switch the kernel to
    the fused damped-Jacobi form ``x + omega * dinv * (r - A x)`` — the
    multigrid smoothing update in ONE pass (the pallas_call boundary
    otherwise forces the elementwise update into a separate full HBM
    pass at beyond-VMEM sizes).

    ``shift_prev``/``shift_scalars`` switch it to the fused CA-GMRES
    Newton-basis step ``(A x - re x + imsq x_prev) * inv_gamma`` — the
    scalars as a (1, 3) DEVICE array ``[[re, imsq, inv_gamma]]`` (they
    are traced per-step values). ``with_dot`` then returns
    ``sum(out*out)`` (the equilibration norm) instead of ``<x, A x>``.
    """
    n = x.shape[0]
    bm, margin, mpad = plan.block_rows, plan.margin, plan.mpad
    ndiag = len(offsets)
    npad = mpad * 128
    nblk = plan.nblk
    X = jnp.pad(x, (0, npad - n)).reshape(mpad, 128)
    X = jnp.pad(X, ((margin, margin), (0, 0)))
    smoothing = smooth_omega is not None
    shifting = shift_prev is not None
    if smoothing:
        if with_dot:
            raise ValueError("with_dot cannot combine with the smooth epilogue")
        if shifting:
            raise ValueError("smooth and shift epilogues are exclusive")
        R = jnp.pad(smooth_r, (0, npad - n)).reshape(mpad, 128)
        DI = jnp.pad(smooth_dinv, (0, npad - n)).reshape(mpad, 128)
    if shifting:
        UP = jnp.pad(shift_prev, (0, npad - n)).reshape(mpad, 128)
        SC = jnp.asarray(shift_scalars, x.dtype).reshape(1, 3)

    isz = x.dtype.itemsize
    budget = x_budget_bytes or _X_VMEM_BUDGET_BYTES
    rows_budget = budget // (128 * isz)
    cblk = max(1, (rows_budget - 2 * margin) // bm)
    outs = []
    dots = []
    for b0 in range(0, nblk, cblk):
        nb = min(cblk, nblk - b0)
        Xw = jax.lax.dynamic_slice_in_dim(X, b0 * bm, nb * bm + 2 * margin)
        Dw = jax.lax.dynamic_slice_in_dim(
            data_blk, b0 * ndiag * bm, nb * ndiag * bm
        )
        smooth = None
        if smoothing:
            Rw = jax.lax.dynamic_slice_in_dim(R, b0 * bm, nb * bm)
            DIw = jax.lax.dynamic_slice_in_dim(DI, b0 * bm, nb * bm)
            smooth = (Rw, DIw, float(smooth_omega))
        shift = None
        if shifting:
            UPw = jax.lax.dynamic_slice_in_dim(UP, b0 * bm, nb * bm)
            shift = (UPw, SC)
        res = _call_kernel(
            offsets, bm, margin, with_dot, interpret, Xw, Dw, nb, smooth,
            shift,
        )
        if with_dot:
            outs.append(res[0])
            dots.append(res[1][0, 0])
        else:
            outs.append(res)
    y = (outs[0] if len(outs) == 1 else jnp.concatenate(outs)).reshape(npad)[:n]
    if with_dot:
        return y, (dots[0] if len(dots) == 1 else jnp.sum(jnp.stack(dots)))
    return y


@functools.partial(
    jax.jit, static_argnames=("offsets", "with_dot", "block_rows", "interpret")
)
def dia_spmv_streamed(
    data: Array,
    offsets: Tuple[int, ...],
    x: Array,
    *,
    with_dot: bool = False,
    block_rows: int = 0,
    interpret: bool = False,
):
    """Convenience wrapper: plan + call in one jit.

    NOTE: the layout transform runs inside the jit here, so inside a
    solver while_loop it is NOT hoisted and costs ~3x the kernel's own
    traffic per iteration — use :func:`plan_dia` once at construction and
    :func:`dia_spmv_planned` for hot loops (DIAOperator does this).
    """
    n = x.shape[0]
    ndiag = len(offsets)
    if not block_rows:
        block_rows = auto_block_rows(ndiag, x.dtype.itemsize)
    plan = _plan_geometry(n, offsets, block_rows)
    bm, mpad, nblk = plan.block_rows, plan.mpad, plan.nblk
    npad = mpad * 128
    D = (
        jnp.pad(data, ((0, 0), (0, npad - n)))
        .reshape(ndiag, nblk, bm, 128)
        .transpose(1, 0, 2, 3)
        .reshape(nblk * ndiag * bm, 128)
    )
    return dia_spmv_planned(
        D, offsets, x, plan, with_dot=with_dot, interpret=interpret
    )


def streamed_fits(n: int, itemsize: int = 4) -> bool:
    """True when x fits the kernel's resident-window budget in one chunk."""
    return n * itemsize <= _X_VMEM_BUDGET_BYTES
