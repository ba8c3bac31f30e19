"""Shared device-format selection for UNSTRUCTURED matrices.

One copy of the measured cost model (previously duplicated by
CSRMatrix.to_device_operator and pc/amg.py, where the two copies had
already drifted — r3 review finding). Measured on v5e (docs/STATUS.md):

- per-element XLA gathers run ~7.7 ns serially, so ELL is the format of
  last resort;
- a dense MXU matvec wins whenever streaming the dense plane beats the
  gathers: m*n*itemsize/650GBps < nnz*7.7ns, i.e.
  m*n < nnz * (7.7e-9 * 650e9 / itemsize) ~= nnz * 5000/itemsize
  (1250 for f32 — the previously hardcoded constant — 625 for f64);
- the cell layout (ops/cellspmv.py, one-hot MXU contractions) wins when
  its padded size times ~4.5 ns beats ELL's n*k slots times ~8 ns — the
  densified wide-k cases, not low-k ones (a k=7 expander row set runs
  faster as plain ELL); its own cost model decides (cells_if_faster).

DIA/const-stencil detection happens BEFORE this cascade (callers try
csr_to_dia first); this module only picks among dense/cells/ELL.

Reference parity: replaces the reference's densifying mat_vec fallback
(src/matrix/sparse.rs:56-67) with measured-rate format dispatch.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# dense plane budget: beyond this, even a winning dense matvec would
# crowd out the solver working set
_DENSE_BYTES_CAP = 192 << 20
# gather-vs-stream breakeven numerator: 7.7 ns/element * 650 GB/s
_BREAKEVEN_BYTES = 5000


class ELLPlanTooLarge(ValueError):
    """Raised when the padded ELL plan exceeds its byte cap (long-tailed
    row-degree distributions pad every row to the widest one). Callers
    that want a fallback catch THIS, not bare ValueError — other
    ValueErrors (bad shapes, dtypes) must propagate."""


def scipy_to_ell(A, dtype, max_bytes: int = 2 << 30):
    """scipy CSR -> ELLOperator (zero-padded rows, int32 columns).

    ``max_bytes`` caps the padded plan (n * max_row_width slots of
    value + int32 column): a long-tailed row-degree distribution pads
    every row to the longest one, and a runaway plan CRASHED the TPU
    worker process at 284k rows in round 4 (stage 9) — fail with a
    clear error instead of taking the worker down."""
    from kryst_tpu.core.linop import ELLOperator

    A = A.tocsr()
    A.sum_duplicates()
    widths = np.diff(A.indptr)
    k = max(int(widths.max()) if len(widths) else 1, 1)
    n = A.shape[0]
    plan_bytes = n * k * (np.dtype(dtype).itemsize + 4)
    if plan_bytes > max_bytes:
        raise ELLPlanTooLarge(
            f"ELL plan is {plan_bytes/2**30:.1f} GiB (n={n} x max row "
            f"width {k}): a long-tailed row distribution pads every row "
            "to the widest one. Use the cell layout "
            "(ops/cellspmv.scipy_to_cells) or split the heavy rows."
        )
    data = np.zeros((n, k), dtype=dtype)
    cols = np.zeros((n, k), dtype=np.int32)
    rows_of_nnz = np.repeat(np.arange(n), widths)
    pos_in_row = np.arange(A.nnz) - np.repeat(A.indptr[:-1], widths)
    data[rows_of_nnz, pos_in_row] = A.data
    cols[rows_of_nnz, pos_in_row] = A.indices
    return ELLOperator(jnp.asarray(data), jnp.asarray(cols), A.shape)


def pick_unstructured(A, dtype, need_rmatvec: bool = True):
    """Dense -> cells -> ELL cascade for a scipy sparse matrix.

    ``need_rmatvec``: build the transposed plan for the cell layout
    ("auto"); pass False for operators used matvec-only (e.g. AMG
    transfer operators on the symmetric path) to halve plan memory.
    """
    from kryst_tpu.core.linop import DenseOperator

    A = A.tocsr()
    if dtype is None:
        dtype = A.data.dtype
    m, n = A.shape
    nnz = A.nnz
    itemsize = np.dtype(dtype).itemsize
    breakeven = max(_BREAKEVEN_BYTES // itemsize, 1)
    if m * n * itemsize <= _DENSE_BYTES_CAP and m * n < nnz * breakeven:
        return DenseOperator(jnp.asarray(np.asarray(A.todense(), dtype=dtype)))
    if nnz >= 50_000:
        from kryst_tpu.ops.cellspmv import cells_if_faster

        widths = np.diff(A.indptr)
        op = cells_if_faster(
            A,
            ell_width=int(widths.max()) if len(widths) else 1,
            dtype=dtype,
            transpose="auto" if need_rmatvec else "never",
        )
        if op is not None:
            return op
    try:
        return scipy_to_ell(A, dtype)
    except ELLPlanTooLarge:
        # ELL plan over the memory cap (long-tailed rows) and the cell
        # cost model declined: cells is still the only SAFE format —
        # force-build it rather than crash the TPU worker on a runaway
        # padded plan. The forced plan keeps an ABSOLUTE byte cap (the
        # same 2 GiB budget ELL was held to) expressed as a pad ratio,
        # so a pathological matrix still fails loudly instead of
        # building a worker-killing plan.
        from kryst_tpu.ops.cellspmv import scipy_to_cells

        cap_ratio = max(8.0, (2 << 30) / (max(nnz, 1) * (itemsize + 4)))
        return scipy_to_cells(
            A, dtype=dtype,
            transpose="auto" if need_rmatvec else "never",
            max_pad_ratio=cap_ratio,
        )
