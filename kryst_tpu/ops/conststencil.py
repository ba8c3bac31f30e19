"""Constant-coefficient stencil SpMV: zero coefficient traffic.

The streamed DIA kernel (ops/streamed.py) is HBM-roofline-bound, and at
8M dof its traffic is ~90% COEFFICIENT panels (7 diagonals x 32 MB vs one
32 MB vector read + 32 MB write). But the BASELINE operators — Poisson,
convection-diffusion, any constant-coefficient PDE on a uniform grid —
have diagonals that are a single constant ``c_k`` masked by the grid
boundary. Detecting that exactly at construction lets the matvec stream
NO coefficients at all: per output block the kernel reads the x window,
applies the same shift algebra as the streamed kernel, multiplies by a
scalar from SMEM, and masks boundary wraps with index arithmetic computed
in registers. Traffic per matvec drops from (ndiag + 2) * 4 bytes/row to
8 bytes/row — measured 3x at 8M dof on v5e (310 us -> ~100 us).

Detection is EXACT (bitwise equality of every diagonal against
``c_k * boundary_mask``), so the kernel computes the same polynomial as
the DIA form up to float addition order; operators that are not exactly
constant-stencil (e.g. smoothed-aggregation RAP levels with boundary
aggregates) keep the general streamed path.

Mask algebra: with row-major grid (n0, ..., nd-1), a diagonal offset
``off`` decomposes uniquely (for reach << axis sizes) into per-axis
deltas. The entry at flat index j is nonzero iff every axis coordinate
stays in bounds after the shift. The slowest axis needs no mask (flat
out-of-range reads hit the kernel's zero padding); inner axes mask on
their coordinate, which the kernel reconstructs from the flat index with
one carry-correction per axis (valid while the fastest masked axis is
>= 128 lanes wide, asserted at plan time).

Reference parity: this accelerates the same SpMV the reference densifies
(src/matrix/sparse.rs:56-67); the constant-stencil case corresponds to
its structured test fixtures (tests/preconditioner_integration.rs:16-33).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from kryst_tpu.ops.streamed import _plan_geometry, DIAPlan

# Resident x-window budget, matching ops/streamed.py.
_X_VMEM_BUDGET_BYTES = 48 * 1024 * 1024


def decompose_offset(
    off: int, grid: Tuple[int, ...], reach: int = 8
) -> Optional[Tuple[int, ...]]:
    """Per-axis deltas of a flat row-major offset, or None.

    Resolves the representation ambiguity (off = nz is dy=1 OR dz=nz) by
    requiring |delta| <= reach on every axis, fastest axis first.
    """
    deltas = [0] * len(grid)
    rem = off
    for ax in range(len(grid) - 1, 0, -1):
        nax = grid[ax]
        d = rem % nax  # python mod: in [0, nax)
        if d <= reach:
            pass
        elif nax - d <= reach:
            d -= nax
        else:
            return None
        deltas[ax] = d
        rem = (rem - d) // nax
    if abs(rem) > reach:
        return None
    deltas[0] = rem
    return tuple(deltas)


def detect_stencil(
    data: np.ndarray, offsets: Tuple[int, ...], grid: Tuple[int, ...],
    reach: int = 8,
) -> Optional[Tuple[np.ndarray, Tuple[Tuple[int, ...], ...], bool]]:
    """(coeffs, per-offset deltas, pallas_ok) if every diagonal is EXACTLY
    a constant masked by the grid boundary, else None.

    Exactness is bitwise (==), so substituting the stencil kernel for the
    DIA kernel changes nothing but float summation order.

    ``pallas_ok`` reports whether the Pallas kernel's lane-geometry
    restriction holds (every MASKED inner axis >= 128 wide). When False
    the shifted-slice XLA form (const_spmv_xla) is still exact and
    panel-free — the right call for f64 refinement outer passes on
    narrow grids (e.g. 100^3) — but const_spmv must not be used.
    """
    if len(grid) < 2 or int(np.prod(grid)) != data.shape[1]:
        return None
    deltas = []
    for off in offsets:
        d = decompose_offset(int(off), grid, reach)
        if d is None:
            return None
        deltas.append(d)
    coeffs = np.zeros(len(offsets), dtype=data.dtype)
    for k, d in enumerate(deltas):
        g = np.asarray(data[k]).reshape(grid)
        core = g[tuple(slice(max(0, -di), ni - max(0, di))
                       for di, ni in zip(d, grid))]
        if core.size == 0:
            return None
        c = core.flat[0]
        if not (core == c).all():
            return None
        # everything outside the valid box must be exactly zero
        nz_total = np.count_nonzero(np.asarray(data[k]))
        nz_core = np.count_nonzero(core)
        if nz_total != nz_core:
            return None
        coeffs[k] = c
    return coeffs, tuple(deltas), pallas_geom_ok(deltas, grid)


def pallas_geom_ok(deltas, grid: Tuple[int, ...]) -> bool:
    """Whether the const-stencil Pallas kernel's lane geometry holds.

    Any axis that actually needs a mask (nonzero delta on a non-slowest
    axis) must be >= 128 wide, AND any masked MIDDLE axis must have
    stride >= 128, so the kernel's per-row coordinate reconstruction
    carries at most one wrap per 128-lane row (see _const_kernel)."""
    ndim = len(grid)
    strides = [1] * ndim
    for ax in range(ndim - 2, -1, -1):
        strides[ax] = strides[ax + 1] * grid[ax + 1]
    return all(
        d[ax] == 0 or (grid[ax] >= 128
                       and (ax == ndim - 1 or strides[ax] >= 128))
        for d in deltas for ax in range(1, ndim)
    )


def const_spmv_xla(
    coeffs: Array,
    deltas: Tuple[Tuple[int, ...], ...],
    grid: Tuple[int, ...],
    x: Array,
) -> Array:
    """Plain-XLA constant-stencil matvec: n-D shifted slices with scalar
    coefficients. Any dtype, any backend — this is the f64 path (Pallas
    f64 is impossible on TPU, see ops/dia.py) and it reads ZERO
    coefficient arrays, unlike dia_spmv_xla whose f64 panels cost
    ndiag * n * 8 bytes per matvec (the dominant term of the refinement
    outer pass at 8M dof)."""
    g = x.reshape(grid)
    y = jnp.zeros_like(g)
    for k, d in enumerate(deltas):
        dst = tuple(
            slice(max(0, -di), ni - max(0, di)) for di, ni in zip(d, grid)
        )
        src = tuple(
            slice(max(0, di), ni + min(0, di)) for di, ni in zip(d, grid)
        )
        y = y.at[dst].add(coeffs[k] * g[src])
    return y.reshape(-1)


def _coord_axes(deltas, grid):
    """(ax, stride, has_rem) for every inner axis some delta masks."""
    ndim = len(grid)
    strides = [1] * ndim
    for ax in range(ndim - 2, -1, -1):
        strides[ax] = strides[ax + 1] * grid[ax + 1]
    need = [any(d[ax] != 0 for d in deltas) for ax in range(ndim)]
    return [(ax, strides[ax], strides[ax] > 1)
            for ax in range(1, ndim) if need[ax]]


def _const_kernel(deltas, grid, offsets, bm, margin, with_dot,
                  smoothing, *refs):
    import jax.experimental.pallas as pl
    import jax.lax as lax_
    from jax.experimental.pallas import tpu as pltpu

    # ref layout: x, coeffs(SMEM), [coord seeds...] [, r, dinv]
    #             -> out [, dot]
    x_ref, c_ref = refs[0], refs[1]
    axes_meta = _coord_axes(deltas, grid)
    ncoord = sum(2 if has_rem else 1 for _, _, has_rem in axes_meta)
    coord_refs = refs[2:2 + ncoord]
    if smoothing:
        r_ref, di_ref = refs[2 + ncoord], refs[3 + ncoord]
        o_ref, rest = refs[4 + ncoord], refs[5 + ncoord:]
    else:
        o_ref, rest = refs[2 + ncoord], refs[3 + ncoord:]

    i = pl.program_id(0)
    i0 = i * bm
    lane = lax_.broadcasted_iota(jnp.int32, (bm, 128), 1)

    # Reconstruct inner-axis coordinates from PER-ROW seeds computed in
    # plain XLA outside the kernel (Mosaic's vector integer div lowering
    # recurses infinitely on real TPU — measured round 3). Within one
    # 128-lane row every masked axis advances by AT MOST one wrap because
    # it is >= 128 wide (asserted at plan time):
    #  - fastest axis (stride 1): c = c0 + lane, one conditional wrap;
    #  - middle axes (stride s >= 128): the coordinate increments exactly
    #    when the row-leading remainder rem0 + lane crosses s, then wraps
    #    at most once.
    ndim = len(grid)
    coords = {}
    ci = 0
    for ax, stride, has_rem in axes_meta:
        c0 = coord_refs[ci][...]  # (bm, 1) int32
        ci += 1
        if has_rem:
            rem0 = coord_refs[ci][...]
            ci += 1
            c = c0 + ((rem0 + lane) >= stride).astype(jnp.int32)
        else:
            c = c0 + lane
        coords[ax] = jnp.where(c < grid[ax], c, c - grid[ax])

    W0 = x_ref[pl.ds(i0, bm + 2 * margin), :]
    acc = None
    for k, off in enumerate(offsets):
        q, r = divmod(off, 128)
        base = margin + q
        if r:
            W = W0[base: base + bm + 1]
            W1 = pltpu.roll(W, jnp.int32(128 - r), axis=1)
            Y = jnp.where(lane < 128 - r, W1[:bm], W1[1: bm + 1])
        else:
            Y = W0[base: base + bm]
        # boundary mask on inner axes (slowest axis rides the zero pad)
        mask = None
        for ax in range(1, ndim):
            d = deltas[k][ax]
            if d == 0:
                continue
            c = coords[ax]
            m = (c + d >= 0) & (c + d < grid[ax]) if d < 0 else (c + d < grid[ax])
            mask = m if mask is None else (mask & m)
        ck = c_ref[k]
        term = ck * (Y if mask is None else jnp.where(mask, Y, 0.0))
        acc = term if acc is None else acc + term
    if smoothing:
        xc = W0[margin: margin + bm]
        omega = c_ref[len(offsets)]  # omega rides the coeff vector
        o_ref[...] = xc + omega * di_ref[...] * (r_ref[...] - acc)
    else:
        o_ref[...] = acc
    if with_dot:
        acc_ref = rest[0]
        xc = W0[margin: margin + bm]
        partial = jnp.sum(xc * acc)

        @pl.when(i == 0)
        def _():
            acc_ref[0, 0] = partial

        @pl.when(i > 0)
        def _():
            acc_ref[0, 0] = acc_ref[0, 0] + partial


def _call_const(offsets, deltas, grid, bm, margin, with_dot, interpret,
                Xw, cvec, coord_args, nb, smooth=None):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    isz = Xw.dtype.itemsize
    kern = functools.partial(
        _const_kernel, deltas, grid, offsets, bm, margin, with_dot,
        smooth is not None,
    )
    out_shape = [jax.ShapeDtypeStruct((nb * bm, 128), Xw.dtype)]
    out_specs = [
        pl.BlockSpec((bm, 128), lambda i: (i, np.int32(0)),
                     memory_space=pltpu.VMEM)
    ]
    if with_dot:
        out_shape.append(jax.ShapeDtypeStruct((1, 1), Xw.dtype))
        out_specs.append(
            pl.BlockSpec((1, 1), lambda i: (np.int32(0), np.int32(0)),
                         memory_space=pltpu.SMEM)
        )
    vmem_bytes = (
        (nb * bm + 2 * margin) * 128 * isz  # resident x window
        + 2 * bm * 128 * isz                # double-buffered output block
        + 6 * (bm + 2 * margin) * 128 * isz  # shift + mask temporaries
        + (8 << 20)
    )
    z = np.int32(0)
    # explicit shapes + int32-zero index maps: a no-shape spec under a
    # grid gets a DEFAULT index map whose zeros are i64 under
    # jax_enable_x64 and Mosaic rejects the kernel (see ops/streamed.py)
    in_specs = [
        pl.BlockSpec((nb * bm + 2 * margin, 128), lambda i: (z, z),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(cvec.shape, lambda i: (z,),
                     memory_space=pltpu.SMEM),  # coeffs (+ omega)
    ]
    args = [Xw, cvec]
    for ca in coord_args:  # per-row coordinate seeds, (nb*bm, 1) int32
        in_specs.append(
            pl.BlockSpec((bm, 1), lambda i: (i, z),
                         memory_space=pltpu.VMEM)
        )
        args.append(ca)  # (double-buffered coord blocks fit the slack)
    if smooth is not None:
        Rw, DIw = smooth
        for extra in (Rw, DIw):
            in_specs.append(
                pl.BlockSpec((bm, 128), lambda i: (i, z),
                             memory_space=pltpu.VMEM)
            )
            args.append(extra)
        vmem_bytes += 4 * bm * 128 * isz
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
        "offsets", "deltas", "grid", "with_dot", "smooth_omega",
        "block_rows", "interpret", "x_budget_bytes",
    ),
)
def const_spmv(
    coeffs: Array,
    offsets: Tuple[int, ...],
    deltas: Tuple[Tuple[int, ...], ...],
    grid: Tuple[int, ...],
    x: Array,
    *,
    with_dot: bool = False,
    smooth_z: Optional[Array] = None,
    smooth_r: Optional[Array] = None,
    smooth_dinv: Optional[Array] = None,
    smooth_omega: Optional[float] = None,
    block_rows: int = 1024,
    interpret: bool = False,
    x_budget_bytes: Optional[int] = None,
):
    """y = A x for a constant-coefficient stencil operator.

    ``smooth_*`` switch to the fused damped-Jacobi form
    ``z + omega * dinv * (r - A z)`` (then ``x`` is ignored; pass
    ``smooth_z`` as the iterate). ``with_dot`` also returns <x, Ax>.
    """
    smoothing = smooth_omega is not None
    if smoothing:
        if with_dot:
            raise ValueError("with_dot cannot combine with the smooth epilogue")
        x = smooth_z
    n = x.shape[0]
    plan = _plan_geometry(n, offsets, block_rows)
    bm, margin, mpad = plan.block_rows, plan.margin, plan.mpad
    npad = mpad * 128
    nblk = plan.nblk
    X = jnp.pad(x, (0, npad - n)).reshape(mpad, 128)
    X = jnp.pad(X, ((margin, margin), (0, 0)))
    cvec = coeffs.astype(x.dtype)
    if smoothing:
        cvec = jnp.concatenate([cvec, jnp.full((1,), smooth_omega, x.dtype)])
        R = jnp.pad(smooth_r, (0, npad - n)).reshape(mpad, 128)
        DI = jnp.pad(smooth_dinv, (0, npad - n)).reshape(mpad, 128)

    isz = x.dtype.itemsize
    budget = x_budget_bytes or _X_VMEM_BUDGET_BYTES
    rows_budget = budget // (128 * isz)
    cblk = max(1, (rows_budget - 2 * margin) // bm)
    outs = []
    dots = []
    axes_meta = _coord_axes(deltas, grid)
    for b0 in range(0, nblk, cblk):
        nb = min(cblk, nblk - b0)
        Xw = jax.lax.dynamic_slice_in_dim(X, b0 * bm, nb * bm + 2 * margin)
        # per-row coordinate seeds for the kernel's mask reconstruction
        # (plain-XLA integer div/mod — Mosaic's vector div lowering
        # recurses on real TPU, so none of this runs inside the kernel)
        j0 = (jnp.arange(nb * bm, dtype=jnp.int32) + b0 * bm) * 128
        coord_args = []
        for ax, stride, has_rem in axes_meta:
            q = j0 // stride
            coord_args.append((q % grid[ax]).astype(jnp.int32)[:, None])
            if has_rem:
                coord_args.append((j0 - q * stride).astype(jnp.int32)[:, None])
        smooth = None
        if smoothing:
            Rw = jax.lax.dynamic_slice_in_dim(R, b0 * bm, nb * bm)
            DIw = jax.lax.dynamic_slice_in_dim(DI, b0 * bm, nb * bm)
            smooth = (Rw, DIw)
        res = _call_const(
            offsets, deltas, grid, bm, margin, with_dot, interpret,
            Xw, cvec, coord_args, nb, smooth,
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
