"""Device-side exact Galerkin RAP by stencil probing.

The host GMG setup (pc/gmg.py) computes every coarse operator with scipy
CSR SpGEMM (P^T (A P)) and uploads the panels through the relay — at 8M
dof that is ~18 s of host matmuls plus ~17 s of uploads, dwarfing the
263 ms solve (VERDICT r3 item 5). This module computes the SAME coarse
operators entirely on the device, using the V-cycle's own transfer
kernels (GMGLevel.prolong / .restrict — reference AMG setup role:
amg.rs:73-119):

    A_c[j, k] = (P^T A P)[j, k]

is extracted EXACTLY by probing with colored indicator vectors. Color
the coarse grid periodically with period p_ax = 2 * reach_ax + 1 per
axis; within the stencil reach of any row j every coarse point then has
a DISTINCT color, so

    w_c = P^T A P v_c,   v_c[k] = 1 iff k = c (mod p)

satisfies w_c[j] = A_c[j, j + o] for the unique in-reach offset o with
color(j + o) = c — one probe per color recovers one diagonal slot per
row with zero cross-talk, including boundary rows (an out-of-grid j + o
matches no in-reach color, giving the exact structural zero).

Everything is plain XLA: probe vectors from iota comparisons, the sweep
via lax.map (sequential — one fine-grid working set at a time), and the
diagonal extraction via static per-residue index_in_dim slices (no
gathers — XLA lowers gathers to ~7.5 ns/element serial loops on TPU).
Arithmetic runs in the level's own dtype/panel precision, so the coarse
operator is the exact Galerkin product of the operator THE DEVICE
ACTUALLY APPLIES — with bf16 coefficient panels this is more consistent
than rounding a host-f64 RAP after the fact.

Cost at 8M dof: 125 probes x (prolong + matvec + restrict) ~ 130 ms per
level plus a ~2 s extraction pass, vs ~35 s host SpGEMM + upload.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from kryst_tpu.ops.dia import DIAOperator


def _decompose_centered(off: int, grid) -> Optional[Tuple[int, ...]]:
    """Minimal-magnitude per-axis deltas of a flat row-major offset
    (centered remainders — conststencil.decompose_offset prefers the
    nonnegative residue within its reach budget, which mislabels e.g.
    off=-1 on a 14-wide axis as dy=+13)."""
    deltas = [0] * len(grid)
    rem = off
    for ax in range(len(grid) - 1, 0, -1):
        nax = grid[ax]
        d = rem % nax
        if d > nax // 2:
            d -= nax
        deltas[ax] = d
        rem = (rem - d) // nax
    if abs(rem) >= grid[0]:
        return None
    deltas[0] = rem
    return tuple(deltas)


def per_axis_reach(offsets, grid) -> Optional[Tuple[int, ...]]:
    """Per-axis stencil reach of a DIA operator on ``grid``; None when an
    offset does not decompose into a bounded grid stencil."""
    reach = [0] * len(grid)
    for off in offsets:
        d = _decompose_centered(int(off), tuple(grid))
        if d is None:
            return None
        for ax, di in enumerate(d):
            reach[ax] = max(reach[ax], abs(di))
    return tuple(reach)


def coarse_reach(fine_reach, smoothed: bool) -> Tuple[int, ...]:
    """Per-axis reach bound of P^T A P with 2:1 aggregation.

    Smoothed P = (I - w D^-1 A) P0: column k's support is the aggregate
    {2k, 2k+1} dilated by A's reach r, i.e. [2k - r, 2k + 1 + r]; two
    coarse columns couple iff their supports come within r of each
    other: 2|j - k| <= 3r + 1. Unsmoothed (P0): 2|j - k| <= r + 1.
    """
    return tuple(
        ((3 * r + 1) // 2 if smoothed else (r + 1) // 2) for r in fine_reach
    )


def probe_ok(coarse, rc) -> bool:
    """Whether probing on this coarse grid is free of color/linear-offset
    aliasing: every axis must hold one full color period (and then
    distinct in-reach stencil deltas also map to distinct linear DIA
    offsets, since each |delta| < the next-axis dimension)."""
    return all(c >= 2 * r + 1 for c, r in zip(coarse, rc))


def _coarse_strides(coarse) -> Tuple[int, ...]:
    s = [1] * len(coarse)
    for ax in range(len(coarse) - 2, -1, -1):
        s[ax] = s[ax + 1] * coarse[ax + 1]
    return tuple(s)


def probe_deltas(rc):
    """Host twin of the offset superset probe_coarse_data rows cover:
    the per-axis delta tuples, row-major over axes, matching
    ``probe_coarse_data``'s output row order."""
    deltas_axes = [list(range(-r, r + 1)) for r in rc]
    return [
        tuple(int(x) for x in t)
        for t in np.stack(
            np.meshgrid(*deltas_axes, indexing="ij"), -1
        ).reshape(-1, len(rc))
    ]


def probe_coarse_data(level, rc, mid="A"):
    """All candidate coarse diagonals of P^T A P (or P^T A^T P) at once.

    ``level``: a GMGLevel (device transfer ops + fine operator A between
    grids level.fine -> level.coarse); ``rc``: per-axis coarse reach
    bound. Returns ``data`` with
    ``data[k, j] = A_c[j, j + off(deltas[k])]`` over the full
    prod(2 rc + 1) offset superset, rows ordered as
    :func:`probe_deltas` (prune after with :func:`prune_diagonals`).
    ``mid="At"`` probes the TRANSPOSED product P^T A^T P = (A_c)^T with
    the middle matvec swapped — prolong/restrict stay as they are
    because restrict is already the exact transpose of prolong
    (P^T = P0^T (I - w A^T D^-1)).

    Jit-safe with ``rc``/``mid`` static: one fused device program per
    level.
    """
    coarse = level.coarse
    d = len(coarse)
    periods = tuple(2 * r + 1 for r in rc)
    if not probe_ok(coarse, rc):
        raise ValueError(
            f"coarse grid {coarse} too small for probe reach {rc}"
        )
    nc = int(np.prod(coarse))
    nprobe = int(np.prod(periods))

    colors = np.stack(
        np.meshgrid(*[np.arange(p) for p in periods], indexing="ij"), -1
    ).reshape(nprobe, d).astype(np.int32)

    if mid == "A":
        op_mv = level.A.matvec
    else:
        op_mv = (level.At if level.At is not None else level.A).matvec

    def one_probe(color):
        m = None
        for ax in range(d):
            io = lax.broadcasted_iota(jnp.int32, coarse, ax)
            mk = (io % periods[ax]) == color[ax]
            m = mk if m is None else (m & mk)
        v = m.astype(level.A.dtype).reshape(-1)
        return level.restrict(op_mv(level.prolong(v)))

    W = lax.map(one_probe, jnp.asarray(colors))  # (nprobe, nc)

    # ---- extraction: d_o[j] = W[color(j + o), j] --------------------
    # Per-axis masked contraction on UNFACTORED grid axes. Earlier forms
    # factored each grid axis into (block, residue) pairs; any width-p
    # axis that lands minormost gets tile-padded to 128 lanes (a 1.12 GB
    # extraction OOMed as 21.3 GB of HLO temps at 8M), and the rescue
    # transposes write padded strided buffers at a fraction of the HBM
    # roofline. Here the grid axes stay whole: consuming probe axis `ax`
    # is, for each offset o and probe component c,
    #     out[o][j] += cur[c][j] * (j_ax mod p == (c - o) mod p)
    # — a sum of p static slices times iota masks per offset. The masks
    # are disjoint, every term is elementwise, and all terms share the
    # same p input slices, so XLA multi-output fusion reads the input
    # ~once per axis. Shapes stay rank <= 2 + d with a grid-axis minor.
    deltas_axes = [list(range(-r, r + 1)) for r in rc]
    cur = W.reshape((nprobe,) + coarse)
    # leading probe axis factors row-major over periods (matches colors)
    for ax in range(d):
        p = periods[ax]
        # cur axes: [off_0..off_{ax-1} fused with remaining probe axes
        # as one leading axis] + grid. Leading axis layout: done offsets
        # slowest, then probe component for `ax`, then remaining probes.
        lead = cur.shape[0]
        # view as (n_done, p, inner, *grid): n_done = offset axes already
        # produced (slowest), p = this axis's probe component, inner =
        # the remaining (un-consumed) probe axes
        n_done = int(np.prod([len(deltas_axes[a]) for a in range(ax)])) or 1
        inner = lead // (n_done * p)
        curv = cur.reshape((n_done, p, inner) + cur.shape[1:])
        # Unrolled per-offset/per-color masked terms. A broadcast-
        # multiply + reduce over the probe-component axis looks cleaner
        # (4 traced ops per axis) but its rank-7 reduce fusion compiled
        # 10x SLOWER at the mid levels (L2 cold compile 289.6 s vs
        # 29.3 s for this form — round-5 stage 9b, reverted); the
        # per-setup retrace cost this loop used to carry is gone via
        # the module-level jit (probe_coarse_data_jit) instead.
        io = lax.broadcasted_iota(
            jnp.int32, tuple(1 for _ in range(3)) + cur.shape[1:], 3 + ax
        )
        pieces = []
        for o in deltas_axes[ax]:
            acc = None
            for c in range(p):
                m = ((io % p) == ((c - o) % p)).astype(W.dtype)
                term = curv[:, c : c + 1] * m
                acc = term if acc is None else acc + term
            pieces.append(acc)  # (n_done, 1, inner, *grid)
        cur = jnp.concatenate(pieces, axis=1).reshape(
            (n_done * len(deltas_axes[ax]) * inner,) + cur.shape[1:]
        )
        # leading layout now: [off_0..off_ax, remaining probes]

    noff_flat = int(np.prod([len(da) for da in deltas_axes]))
    return cur.reshape((noff_flat, nc))


def prune_diagonals(data, deltas, coarse, tol: float = 0.0):
    """Drop all-zero probed diagonals (ONE tiny device->host fetch of
    per-diagonal max |.|); always keeps the main diagonal. Returns
    ``(data_kept, linear_offsets)`` sorted by linear offset, with the
    row selection done by static per-row slices (no device gather)."""
    maxabs = np.asarray(_maxabs_rows(data))
    strides = _coarse_strides(coarse)
    keep, offs = [], []
    for k, dl in enumerate(deltas):
        lin = int(sum(di * s for di, s in zip(dl, strides)))
        if maxabs[k] > tol or all(di == 0 for di in dl):
            keep.append(k)
            offs.append(lin)
    order = np.argsort(np.asarray(offs, dtype=np.int64), kind="stable")
    keep = [keep[i] for i in order]
    offs = tuple(int(offs[i]) for i in order)
    rows = _stack_rows(data, tuple(keep))
    return rows, offs


# Module-level jits: GMGPC.setup used to create fresh jit wrappers per
# call, so every setup re-traced and re-loaded every graph (~10 s/level
# client-side at 8M on this 1-core host, round-5 stage 9). A module-
# level jit keeps one trace cache per (structure, statics) for the
# process lifetime.
@jax.jit
def _maxabs_rows(x):
    return jnp.max(jnp.abs(x), axis=1)


@functools.partial(jax.jit, static_argnums=(1,))
def _stack_rows(x, keep):
    return jnp.stack([x[k] for k in keep])


@jax.jit
def _bf16_exact(x):
    """True iff every f32 value is EXACTLY representable in bf16.

    Must NOT be written as ``x.astype(bf16).astype(f32) == x``: XLA's
    algebraic simplifier folds the f32->bf16->f32 convert pair into
    identity inside jit on this TPU backend, so that form is always-true
    — which silently stored every probed coarse panel in lossy bf16 and
    made 2-D probe V-cycles indefinite (PCG beta<0 at iteration 1,
    found round 5 on chip). bf16 shares f32's exponent field, so a
    finite f32 round-trips exactly iff its low 16 mantissa bits are
    zero — a bitwise test the simplifier cannot fold."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jnp.all((bits & jnp.uint32(0xFFFF)) == 0)


@functools.partial(jax.jit, static_argnames=("target", "ndiag", "plan"))
def _blk_device(data, target, ndiag, plan):
    x = data.astype(target)
    npad = plan.mpad * 128
    z = jnp.zeros((ndiag, npad), target).at[:, : x.shape[1]].set(x)
    return (
        z.reshape(ndiag, plan.nblk, plan.block_rows, 128)
        .transpose(1, 0, 2, 3)
        .reshape(plan.nblk * ndiag * plan.block_rows, 128)
    )


probe_coarse_data_jit = jax.jit(probe_coarse_data, static_argnums=(1, 2))


def relayout_device(data, offsets, n, block_rows: int = 0, blk_dtype=None):
    """Device-side mirror of ops/streamed.py::plan_dia: the identical
    blocked-flat panel layout, computed by jnp reshape/transpose on the
    DEVICE array (plan_dia needs host data; fetching a probed 8M-level
    panel back through the relay costs ~130 s — the round-4 profiled
    setup wall). Returns ``(data_blk, plan)``."""
    from kryst_tpu.ops.streamed import DIAPlan, _plan_geometry, auto_block_rows

    target = jnp.dtype(blk_dtype) if blk_dtype is not None else data.dtype
    ndiag = data.shape[0]
    if not block_rows:
        block_rows = auto_block_rows(ndiag, target.itemsize)
    plan = _plan_geometry(n, offsets, block_rows)
    if target.itemsize < 4 and plan.block_rows % 16:
        # bf16 sublane tile is 16 rows (plan_dia applies the same bump)
        bm16 = -(-plan.block_rows // 16) * 16
        plan = DIAPlan(bm16, plan.margin, -(-plan.mpad // bm16) * bm16)

    return _blk_device(data, target, ndiag, plan), plan


def build_coarse_operator(
    data, offsets, n, symmetric: bool, data_t=None, offsets_t=None,
    blk_dtype=None,
) -> DIAOperator:
    """DIAOperator from probed device data — the device twin of
    ops/dia.py::_make_dia without any host-side value pass.

    Streaming panels are attached under _make_dia's policy (beyond the
    VMEM-residency threshold or > 8 diagonals, sub-f64, TPU backend).
    ``blk_dtype=None`` runs the auto-bf16 exactness check ON DEVICE (one
    scalar fetch): panels go bf16 only when the round trip is
    bitwise-exact — the same rule as _make_dia."""
    probe = DIAOperator(data, offsets, n)
    streaming = (
        (not probe._resident() or len(offsets) > 8)
        and data.dtype.itemsize < 8
        and jax.default_backend() != "cpu"
    )
    at = None
    if data_t is not None:
        at = build_coarse_operator(
            data_t, offsets_t, n, False, blk_dtype=blk_dtype
        )
    if not streaming:
        # flat twin for the XLA shifted-slice path (see DIAOperator.
        # data_flat): device reshape, one relayout copy at setup time
        return DIAOperator(
            data, offsets, n, None, None, at, symmetric,
            data_flat=data.reshape(-1),
        )
    if blk_dtype is None and data.dtype == jnp.float32:
        if bool(_bf16_exact(data)):
            blk_dtype = jnp.bfloat16
    dblk, plan = relayout_device(data, offsets, n, blk_dtype=blk_dtype)
    return DIAOperator(data, offsets, n, dblk, plan, at, symmetric)


def dia_to_scipy_host(data, offsets, n):
    """scipy CSR from (host-fetched) row-indexed DIA data. Our convention
    is data[k, i] = A[i, i + off]; scipy's dia_matrix indexes by COLUMN
    (entry (i, i+off) lives at data[k, i+off]) — shift accordingly.
    Used by probe-mode GMG setup to hand SMALL remaining levels back to
    the host SpGEMM path when the grid gets too small for alias-free
    probing."""
    import scipy.sparse as sp

    data = np.asarray(data, dtype=np.float64)
    sd = np.zeros_like(data)
    for k, off in enumerate(offsets):
        if off >= 0:
            sd[k, off:] = data[k, : n - off] if off else data[k]
        else:
            sd[k, : n + off] = data[k, -off:]
    m = sp.dia_matrix((sd, np.asarray(offsets)), shape=(n, n)).tocsr()
    m.eliminate_zeros()
    return m


def dia_to_dense_host(data, offsets, n) -> np.ndarray:
    """Dense f64 reconstruction of a (small) DIA operator on the host —
    used for the bottom-level explicit inverse in probe-mode GMG setup."""
    M = np.zeros((n, n), np.float64)
    for k, off in enumerate(offsets):
        lo = max(0, -off)
        hi = min(n, n - off)
        idx = np.arange(lo, hi)
        M[idx, idx + off] = np.asarray(data[k])[lo:hi].astype(np.float64)
    return M
