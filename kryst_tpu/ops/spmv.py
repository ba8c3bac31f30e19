"""Sparse matrix-vector product kernels.

The reference's CSR ``spmv`` densifies the matrix before multiplying
(src/matrix/sparse.rs:56-67) — a placeholder, not a kernel. Here the
device format is ELLPACK (regular ``(n, k)`` value/column planes) and the
SpMV is a gather + multiply + row-reduce:

    y[i] = sum_j data[i, j] * x[cols[i, j]]

Two code paths:
- ``ell_spmv_xla``: pure jnp; XLA fuses the gather+mul+sum into one pass.
- ``ell_spmv_pallas``: Pallas TPU kernel that tiles rows into VMEM blocks
  and keeps the whole ``x`` vector resident in VMEM (valid for n up to a
  few M at f32), avoiding re-fetch of x per nonzero.

``ell_spmv`` dispatches: Pallas on TPU when shapes are tile-friendly,
XLA elsewhere (CPU tests, odd shapes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def ell_spmv_xla(data, cols, x):
    """Reference XLA path: one gather and a row reduction."""
    return (data * x[cols]).sum(axis=1)


def _spmv_kernel(x_ref, data_ref, cols_ref, out_ref):
    """Pallas row-block ELL SpMV: rows blocked on the grid, x fully in VMEM."""
    d = data_ref[...]
    c = cols_ref[...]
    x = x_ref[...]
    out_ref[...] = jnp.sum(d * x[c], axis=1)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "METAL")
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.jit, static_argnames=("block_rows",))
def ell_spmv_pallas(data, cols, x, *, block_rows: int = 1024):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = data.shape
    grid = (n // block_rows,)
    return pl.pallas_call(
        _spmv_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if False else pltpu.VMEM),
            pl.BlockSpec((block_rows, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), data.dtype),
    )(x, data, cols)


def ell_spmv(data, cols, x):
    """ELL SpMV with automatic backend dispatch."""
    # Pallas gather-in-kernel support varies; the XLA path is already a
    # single fused pass and is used as the default. The Pallas kernel is
    # opt-in from bench code where its layout wins are measured.
    return ell_spmv_xla(data, cols, x)
