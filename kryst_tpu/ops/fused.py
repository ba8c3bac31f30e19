"""Fused vector kernels for the Krylov hot loop.

The reference's Rayon layer fuses axpy+dot loops on the CPU
(wrappers.rs:92-127, cg.rs:147-154). Round-1 history: these Pallas kernels
were written against a measured-looking "~27 us dispatch per XLA op" — a
number that turned out to be an artifact of timing through the host relay
(~29 ms RPC round-trip amortized over too few iterations). Correctly
measured (iteration-count slope inside one jit call), per-op overhead is
~0.25 us and XLA keeps the whole 1M-dof CG state VMEM-resident across
while_loop iterations, so a pallas_call boundary — which forces operands
through HBM — makes the iteration SLOWER (44 us vs 28 us per PCG iteration
at 1M dof, measured on v5e).

Consequently ``cg_fused_update`` is now plain XLA (the fusion engine does
the fusing), and the Pallas variants below are kept for the record, for
tests, and for the scalar-accumulation pattern documentation: the (1,1)
SMEM output with a constant index map stays resident across sequential
grid steps, so read-modify-write accumulation is safe on TPU.

The hot-path Pallas SpMV work lives in ops/streamed.py, where it belongs:
BEYOND the VMEM-residency threshold, where streaming coefficients through
VMEM beats XLA's HBM-bound shifted slices by ~8x.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def _on_cpu() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# fused x/r update + <r', r'>
# ---------------------------------------------------------------------------

def _update_kernel(x_ref, p_ref, r_ref, q_ref, a_ref, xo_ref, ro_ref, rr_ref):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    a = a_ref[0]
    x_new = x_ref[...] + a * p_ref[...]
    r_new = r_ref[...] - a * q_ref[...]
    xo_ref[...] = x_new
    ro_ref[...] = r_new
    partial = jnp.sum(r_new * r_new)

    @pl.when(i == 0)
    def _():
        rr_ref[0, 0] = partial

    @pl.when(i > 0)
    def _():
        rr_ref[0, 0] = rr_ref[0, 0] + partial


@functools.partial(jax.jit, static_argnames=("block",))
def _cg_fused_update_pallas(x, p, r, q, alpha, block: int = 65536):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    blk = min(block, n)
    while n % blk != 0:
        blk //= 2
    grid = (n // blk,)
    vec = lambda: pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM)
    xo, ro, rr = pl.pallas_call(
        _update_kernel,
        grid=grid,
        in_specs=[
            vec(), vec(), vec(), vec(),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            vec(), vec(),
            pl.BlockSpec((1, 1), lambda i: (np.int32(0), np.int32(0)), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n,), x.dtype),
            jax.ShapeDtypeStruct((n,), x.dtype),
            jax.ShapeDtypeStruct((1, 1), x.dtype),
        ),
    )(x, p, r, q, alpha.reshape(1))
    return xo, ro, rr[0, 0]


# ---------------------------------------------------------------------------
# fused DIA SpMV + <p, Ap>
# ---------------------------------------------------------------------------

def _spmv_dot_kernel(offsets, m, x_ref, d_ref, o_ref, acc_ref):
    """Rolled DIA SpMV (see ops/dia.py) + the <p, Ap> partial in one pass."""
    import jax.experimental.pallas as pl
    import jax.lax as lax_
    from jax.experimental.pallas import tpu as pltpu

    X = x_ref[...]
    lane = lax_.broadcasted_iota(jnp.int32, (m, 128), 1)
    acc = None
    for k, off in enumerate(offsets):
        q, r = divmod(off, 128)
        Y = pltpu.roll(X, jnp.int32((-q) % m), axis=0) if q % m else X
        if r:
            Y1 = pltpu.roll(Y, jnp.int32((-r) % 128), axis=1)
            Y2 = pltpu.roll(Y1, jnp.int32(m - 1), axis=0)
            Y = jnp.where(lane < 128 - r, Y1, Y2)
        term = d_ref[k] * Y
        acc = term if acc is None else acc + term
    o_ref[...] = acc
    acc_ref[0, 0] = jnp.sum(X * acc)


@functools.partial(jax.jit, static_argnames=("offsets",))
def dia_spmv_dot(data: Array, offsets: Tuple[int, ...], p: Array):
    """(A p, <p, A p>) in a single Pallas launch (whole vector in VMEM).

    Only valid while (ndiag + 2) coefficient/vector planes fit VMEM —
    roughly n * (ndiag + 2) * 4B < 12 MB, e.g. 7-diagonal operators up to
    ~330k dof in f32. Callers must gate on size (falls back to
    matvec + dot otherwise)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = p.shape[0]
    if _on_cpu() or (len(offsets) + 2) * n * p.dtype.itemsize > 12 * 1024 * 1024:
        from kryst_tpu.ops.dia import dia_spmv_xla

        y = dia_spmv_xla(data, offsets, p)
        return y, jnp.sum(p * y)
    m = -(-n // 128)
    m = -(-m // 8) * 8
    npad = m * 128
    X = jnp.pad(p, (0, npad - n)).reshape(m, 128)
    D = jnp.pad(data, ((0, 0), (0, npad - n))).reshape(len(offsets), m, 128)
    kern = functools.partial(_spmv_dot_kernel, offsets, m)
    y, pap = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, 128), p.dtype),
            jax.ShapeDtypeStruct((1, 1), p.dtype),
        ),
    )(X, D)
    return y.reshape(npad)[:n], pap[0, 0]


def cg_fused_update(x, p, r, q, alpha) -> Tuple[Array, Array, Array]:
    """(x + alpha p, r - alpha q, <r', r'>).

    Plain XLA ops on purpose: XLA fuses this chain into 1-2 fusions and —
    decisively — keeps the vectors VMEM-resident across while_loop
    iterations at 1M-dof scale (128 MB VMEM on v5e). The Pallas variant
    (:func:`_cg_fused_update_pallas`, kept for the record and covered by
    tests) forces the four vectors through HBM at the kernel boundary and
    measured 16 us/iteration SLOWER inside PCG at 1M dof."""
    alpha = jnp.asarray(alpha, x.dtype)
    x_new = x + alpha * p
    r_new = r - alpha * q
    return x_new, r_new, jnp.sum(r_new * r_new)
