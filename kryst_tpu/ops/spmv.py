"""Sparse matrix-vector product kernels.

The reference's CSR ``spmv`` densifies the matrix before multiplying
(src/matrix/sparse.rs:56-67) — a placeholder, not a kernel. Here the
device format is ELLPACK (regular ``(n, k)`` value/column planes) and the
SpMV is a gather + multiply + row-reduce:

    y[i] = sum_j data[i, j] * x[cols[i, j]]

See ``ell_spmv`` for the measured TPU performance caveat and the DIA
escape hatch (ops/dia.py).
"""
from __future__ import annotations



def ell_spmv_xla(data, cols, x):
    """Reference XLA path: one gather and a row reduction."""
    return (data * x[cols]).sum(axis=1)


def ell_spmv(data, cols, x):
    """ELL SpMV (gather-based).

    PERFORMANCE NOTE (measured on v5e): XLA lowers the gather to a serial
    ~7.5 ns/element loop, so this path runs at ~2 GB/s on TPU — fine for
    setup-time and CPU-test work, wrong for hot loops. For TPU hot paths
    convert to DIA (ops/dia.py, gather-free shifted slices) — `api.solve`
    does this automatically when the diagonal structure allows. Mosaic's
    Pallas supports only lane-local 2-D gathers, so there is no faster
    general-gather kernel to write on this hardware generation.
    """
    return ell_spmv_xla(data, cols, x)
