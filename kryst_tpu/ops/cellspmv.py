"""Cell SpMV: unstructured sparse matvec without per-element gathers.

The reference's CSR spmv walks ``indices`` row by row
(src/matrix/sparse.rs:56-67) — on TPU any such per-element gather lowers
to a ~7.7 ns/element serial loop (ops/spmv.py), which is why DIA
(ops/dia.py) is the hot-path format. But DIA requires a bounded diagonal
count; matrices that stay wide-banded even after RCM (unstructured AMG
levels, expander-like graphs) previously fell back to the gather path.

This module is the TPU-native answer for those: tile the matrix into
``R x W`` *cells* (row-block x column-chunk) at setup, split each cell's
entries into fixed-size records of ``P`` entries, and evaluate

    y[block] = sum_records onehot(lrow)^T @ ( (onehot(lcol) @ x_chunk) * val )

so every irregular access becomes a small dense contraction the MXU can
run, and every x read is a contiguous ``W``-wide chunk row. The only
remaining gather is a *row* gather of whole ``W``-wide chunks from the
``(n/W, W)`` table (embedding-lookup shape), or optionally a vmapped
``dynamic_slice`` — selected by ``gather_mode`` (measured on v5e; see
docs/STATUS.md).

Records are laid out block-major and padded per block, so the scatter
side is a free reshape-reduction (no scatter op at all). All padding
carries ``val = 0`` and index 0, contributing exact zeros.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.tree_util import register_dataclass

Array = jax.Array


# ---------------------------------------------------------------------------
# host-side planning
# ---------------------------------------------------------------------------


def _choose_p(cell_sizes: np.ndarray) -> int:
    """Record size: power of two near the 90th-percentile cell size,
    clipped to [4, 128]. Bigger cells split into several records; smaller
    pad with zeros."""
    if len(cell_sizes) == 0:
        return 4
    q = float(np.quantile(cell_sizes, 0.9))
    p = 1 << max(2, int(np.ceil(np.log2(max(q, 1.0)))))
    return int(min(128, max(4, p)))


@dataclasses.dataclass(frozen=True)
class CellPlan:
    """Host-side record layout for one matrix (all numpy)."""

    lrow: np.ndarray  # (NB, K, P) int32, row index within block
    lcol: np.ndarray  # (NB, K, P) int32, column index within chunk
    val: np.ndarray   # (NB, K, P) dtype
    chk: np.ndarray   # (NB, K) int32, column-chunk id per record
    shape: Tuple[int, int]
    R: int
    W: int
    nnz: int

    @property
    def pad_ratio(self) -> float:
        return float(self.val.size) / max(self.nnz, 1)


def plan_cells(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    shape: Tuple[int, int],
    *,
    R: int = 1024,
    W: int = 128,
    P: Optional[int] = None,
    dtype=np.float32,
    max_pad_ratio: float = 8.0,
) -> CellPlan:
    """Group COO entries into (row-block x column-chunk) cell records.

    Raises ``ValueError`` when padding would blow the layout past
    ``max_pad_ratio`` x nnz (e.g. one dense row) — callers fall back to
    ELL for such shapes.
    """
    m, n = shape
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)
    nnz = len(vals)
    NB = max(1, -(-m // R))
    NC = max(1, -(-n // W))

    block = rows // R
    chunk = cols // W
    order = np.lexsort((chunk, block))
    rows, cols, vals = rows[order], cols[order], vals[order]
    block, chunk = block[order], chunk[order]

    # cell boundaries (entries sorted by (block, chunk))
    cell_key = block * NC + chunk
    if nnz:
        new_cell = np.empty(nnz, dtype=bool)
        new_cell[0] = True
        np.not_equal(cell_key[1:], cell_key[:-1], out=new_cell[1:])
        cell_starts = np.flatnonzero(new_cell)
        cell_sizes = np.diff(np.append(cell_starts, nnz))
    else:
        cell_starts = np.zeros(0, dtype=np.int64)
        cell_sizes = np.zeros(0, dtype=np.int64)

    if P is None:
        P = _choose_p(cell_sizes)

    # split cells into records of <= P entries
    recs_per_cell = -(-cell_sizes // P)
    rec_base = np.concatenate([[0], np.cumsum(recs_per_cell)])
    REC = int(rec_base[-1])
    # per-entry record id and slot
    cell_of_entry = np.repeat(np.arange(len(cell_starts)), cell_sizes)
    within = np.arange(nnz) - cell_starts[cell_of_entry]
    rec_of_entry = rec_base[cell_of_entry] + within // P
    slot = within % P

    # per-record metadata
    rec_block = np.repeat(block[cell_starts], recs_per_cell)
    rec_chunk = np.repeat(chunk[cell_starts], recs_per_cell)

    # per-block record counts -> K
    recs_in_block = np.bincount(rec_block, minlength=NB)
    K = max(1, int(recs_in_block.max() if len(recs_in_block) else 1))

    padded = NB * K * P
    if nnz and padded > max_pad_ratio * nnz and padded > 1 << 16:
        raise ValueError(
            f"cell plan padding {padded}/{nnz} exceeds {max_pad_ratio}x "
            f"(K={K}, P={P}) — matrix too irregular for the cell layout"
        )

    # destination (block, k) for each record: k = running index within block
    rec_k = np.arange(REC) - np.concatenate([[0], np.cumsum(recs_in_block)])[rec_block]

    # Narrowest lossless index dtypes: the record stream is the matvec's
    # dominant HBM traffic (measured ~4.5 ns/padded entry streamed), so
    # int32 everywhere pays 12 B/entry where 7 suffice — lcol < W (128
    # default -> int8 covers 0..127), lrow < R (1024 default -> int16).
    # The device kernel compares against an iota of the SAME dtype and
    # promotes to the accumulator only inside the fused one-hot, so
    # narrowing is value-exact.
    def _idx_dtype(bound: int):
        if bound <= 128:
            return np.int8  # values 0..127
        if bound <= 32768:
            return np.int16
        return np.int32

    lrow = np.zeros((NB, K, P), dtype=_idx_dtype(R))
    lcol = np.zeros((NB, K, P), dtype=_idx_dtype(W))
    val = np.zeros((NB, K, P), dtype=dtype)
    chk = np.zeros((NB, K), dtype=np.int32)
    chk[rec_block, rec_k] = rec_chunk
    b_e = rec_block[rec_of_entry]
    k_e = rec_k[rec_of_entry]
    lrow[b_e, k_e, slot] = (rows % R).astype(lrow.dtype)
    lcol[b_e, k_e, slot] = (cols % W).astype(lcol.dtype)
    val[b_e, k_e, slot] = vals.astype(dtype)

    return CellPlan(
        lrow=lrow, lcol=lcol, val=val, chk=chk, shape=(m, n), R=R, W=W,
        nnz=nnz,
    )


# ---------------------------------------------------------------------------
# device operator
# ---------------------------------------------------------------------------


def _batch_blocks(K: int, P: int, W: int, R: int, NB: int,
                  budget_bytes: int = 32 << 20) -> int:
    """Blocks per loop step so the materialized one-hot operand
    (BB, K, P, max(W, R)) stays under ``budget_bytes`` f32."""
    per_block = K * P * max(W, R) * 4
    bb = max(1, budget_bytes // max(per_block, 1))
    return int(min(NB, bb))


@dataclasses.dataclass(frozen=True)
class CellOperator:
    """Device operator over a :class:`CellPlan` layout.

    ``gather_mode``:
      * ``"table"`` — x chunks fetched as row-gathers from the
        ``(NC, W)`` reshape of x (embedding-lookup shape).
      * ``"slice"`` — vmapped ``dynamic_slice`` of W-contiguous runs.
    Both produce identical results; the plan picks the mode measured
    faster on the target backend.
    """

    # Record streams are stored FLAT (NB*K*P,) and reshaped per batch
    # inside the matvec: a (NB, K, P) device array tiles its last two
    # dims to (8, 128), so a P=8 record layout would read 16x its bytes
    # from HBM (the record stream is the cell matvec's dominant
    # traffic); the flat form keeps a dense 1-D layout and the in-body
    # reshape is a small VMEM-local relayout of the current batch only.
    lrow: Array  # (NB*K*P,) int8/int16/int32
    lcol: Array  # (NB*K*P,) int8/int16/int32
    val: Array   # (NB*K*P,)
    chk: Array   # (NB*K,) int32, column-chunk id per record
    diag: Array  # (m,) diagonal (for Jacobi-type PCs)
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    R: int = dataclasses.field(metadata=dict(static=True))
    W: int = dataclasses.field(metadata=dict(static=True))
    BB: int = dataclasses.field(metadata=dict(static=True))
    gather_mode: str = dataclasses.field(metadata=dict(static=True))
    rec_shape: Tuple[int, int, int] = dataclasses.field(
        default=(0, 0, 0), metadata=dict(static=True)
    )  # (NB, K, P)
    At: Optional["CellOperator"] = None  # transpose plan (None => symmetric)

    @property
    def dtype(self):
        return self.val.dtype

    def matvec(self, x: Array) -> Array:
        m, n = self.shape
        NB, K, P = self.rec_shape
        R, W, BB = self.R, self.W, self.BB
        NC = -(-n // W)
        acc = jnp.promote_types(self.val.dtype, x.dtype)
        x_pad = jnp.zeros(NC * W, acc).at[:n].set(x.astype(acc))
        x2d = x_pad.reshape(NC, W)
        iw = jnp.arange(W, dtype=self.lcol.dtype)
        ir = jnp.arange(R, dtype=self.lrow.dtype)
        nbatch = -(-NB // BB)
        y2d0 = jnp.zeros((nbatch * BB, R), acc)

        def body(b, y2d):
            off = b * BB
            # flat dense reads + small VMEM-local reshapes (see the
            # field comment: 3-D record arrays tile-pad 8-16x)
            lrow = lax.dynamic_slice_in_dim(
                self.lrow, off * K * P, BB * K * P, 0
            ).reshape(BB, K, P)
            lcol = lax.dynamic_slice_in_dim(
                self.lcol, off * K * P, BB * K * P, 0
            ).reshape(BB, K, P)
            val = lax.dynamic_slice_in_dim(
                self.val, off * K * P, BB * K * P, 0
            ).reshape(BB, K, P)
            chk = lax.dynamic_slice_in_dim(
                self.chk, off * K, BB * K, 0
            ).reshape(BB, K)
            if self.gather_mode == "slice":
                g = jax.vmap(
                    lambda s: lax.dynamic_slice(x_pad, (s * W,), (W,))
                )(chk.reshape(-1)).reshape(BB, K, W)
            else:
                g = x2d[chk]                                   # (BB, K, W)
            oh_c = (lcol[..., None] == iw).astype(acc)         # (BB,K,P,W)
            gv = jnp.einsum("bkpw,bkw->bkp", oh_c, g) * val.astype(acc)
            oh_r = (lrow[..., None] == ir).astype(acc)         # (BB,K,P,R)
            yb = jnp.einsum("bkpr,bkp->br", oh_r, gv)          # (BB, R)
            return lax.dynamic_update_slice(y2d, yb, (off, 0))

        y2d = lax.fori_loop(0, nbatch, body, y2d0)
        return y2d.reshape(-1)[:m].astype(x.dtype)

    def rmatvec(self, x: Array) -> Array:
        op = self.At if self.At is not None else self
        return op.matvec(x)

    def diagonal(self) -> Array:
        return self.diag

    def todense(self) -> Array:
        """Reconstruct dense (setup/test-time only: uses scatter-add)."""
        m, n = self.shape
        NB, K, P = self.rec_shape
        lrow = self.lrow.reshape(NB, K, P).astype(jnp.int32)
        lcol = self.lcol.reshape(NB, K, P).astype(jnp.int32)
        chk = self.chk.reshape(NB, K)
        blk = jnp.arange(NB, dtype=jnp.int32)[:, None, None]
        rows = blk * self.R + lrow
        cols = chk[:, :, None] * self.W + lcol
        dense = jnp.zeros((NB * self.R, -(-n // self.W) * self.W),
                          self.val.dtype)
        dense = dense.at[rows.reshape(-1), cols.reshape(-1)].add(
            self.val.reshape(-1)
        )
        return dense[:m, :n]


register_dataclass(
    CellOperator,
    data_fields=["lrow", "lcol", "val", "chk", "diag", "At"],
    meta_fields=["shape", "R", "W", "BB", "gather_mode", "rec_shape"],
)


def _plan_to_device(plan: CellPlan, diag: np.ndarray, At: Optional[CellOperator],
                    gather_mode: str) -> CellOperator:
    NB, K, P = plan.lrow.shape
    BB = _batch_blocks(K, P, plan.W, plan.R, NB)
    # pad NB to a multiple of BB: dynamic_slice CLAMPS out-of-range starts,
    # which would silently misalign the final partial batch
    NBp = -(-NB // BB) * BB
    pad = [(0, NBp - NB)] + [(0, 0)] * 2
    lrow = np.pad(plan.lrow, pad)
    lcol = np.pad(plan.lcol, pad)
    val = np.pad(plan.val, pad)
    chk = np.pad(plan.chk, pad[:2])
    return CellOperator(
        lrow=jnp.asarray(lrow.reshape(-1)),
        lcol=jnp.asarray(lcol.reshape(-1)),
        val=jnp.asarray(val.reshape(-1)),
        chk=jnp.asarray(chk.reshape(-1)),
        diag=jnp.asarray(diag.astype(plan.val.dtype)),
        shape=plan.shape,
        R=plan.R, W=plan.W, BB=BB, gather_mode=gather_mode,
        rec_shape=(NBp, plan.lrow.shape[1], plan.lrow.shape[2]), At=At,
    )


def _plan_auto(coo, shape, *, R, W, P, dtype, max_pad_ratio) -> CellPlan:
    """Tile-size selection. Explicit ints pass through. ``R="auto"``:
    while the plan is VMEM-resident the padded size is the cost (measured
    1.5 ns/padded entry regardless of tile shape), so try a few (R, W)
    and keep the smallest; beyond residency the HBM-streamed rate is
    layout-bound and (1024, 128) measured best (narrow chunks gather at
    914 Mrows/s vs 88 at W=512)."""
    if R != "auto":
        return plan_cells(coo.row, coo.col, coo.data, shape, R=R, W=W,
                          P=P, dtype=dtype, max_pad_ratio=max_pad_ratio)
    if coo.nnz * 2 * 12 > _CELL_VMEM_BYTES:
        # Beyond VMEM the dominant cost is the BATCHED loop: nbatch ~
        # padded * max(W, R) / VMEM-budget (the one-hot operand bounds
        # blocks-per-batch), each batch paying a ~0.1 ms dispatch+fusion
        # floor. Minimize padded * max(W, R) over tile-aligned R: on the
        # 1M random-Delaunay stiffness (near-singleton cells, P=4) the
        # old fixed R=1024 plan measured 137 ms where R=128 runs 70.5 —
        # 1.3x above the 54 ms serial-gather floor (round-5 stage 10c/d;
        # R < 128 LOSES: sublane-padded temps). Clustered matrices with
        # fat cells keep preferring large R through the same model.
        best, bcost, err = None, None, None
        for r in (1024, 256, 128):
            try:
                pl = plan_cells(coo.row, coo.col, coo.data, shape, R=r,
                                W=128, P=P, dtype=dtype,
                                max_pad_ratio=max_pad_ratio)
            except ValueError as e:
                err = e
                continue
            cost = pl.lrow.size * max(pl.W, pl.R)
            if best is None or cost < bcost:
                best, bcost = pl, cost
        if best is None:
            raise err
        return best
    best, err = None, None
    for r, w in ((1024, 128), (512, 512), (512, 128), (256, 256)):
        try:
            pl = plan_cells(coo.row, coo.col, coo.data, shape, R=r, W=w,
                            P=P, dtype=dtype, max_pad_ratio=max_pad_ratio)
        except ValueError as e:
            err = e
            continue
        if best is None or pl.lrow.size < best.lrow.size:
            best = pl
    if best is None:
        raise err
    return best


def scipy_to_cells(
    A,
    *,
    dtype=np.float32,
    R="auto",
    W: int = 128,
    P: Optional[int] = None,
    gather_mode: str = "table",
    transpose: str = "auto",
    max_pad_ratio: float = 8.0,
) -> CellOperator:
    """scipy.sparse -> :class:`CellOperator`.

    ``R``: row-block size, or ``"auto"`` (default) to let the measured
    cost model pick the tile shape — see :func:`_plan_auto`.
    ``transpose``: "auto" detects symmetry (then rmatvec == matvec);
    "always" builds a transpose plan; "never" leaves rmatvec aliased to
    matvec (only valid for symmetric use).
    """
    import scipy.sparse as sp

    coo = sp.coo_matrix(A)
    m, n = coo.shape
    plan = _plan_auto(coo, (m, n), R=R, W=W, P=P, dtype=dtype,
                      max_pad_ratio=max_pad_ratio)
    R, W = plan.R, plan.W
    diag = np.zeros(m, dtype=np.float64)
    on_diag = coo.row == coo.col
    np.add.at(diag, coo.row[on_diag], coo.data[on_diag])

    At = None
    if transpose != "never":
        symmetric = False
        if transpose == "auto" and m == n:
            symmetric = (abs(coo.T - coo.tocsr())).max() == 0 if coo.nnz else True
        if not symmetric:
            plan_t = plan_cells(
                coo.col, coo.row, coo.data, (n, m), R=R, W=W, P=P,
                dtype=dtype, max_pad_ratio=max_pad_ratio,
            )
            diag_t = np.zeros(n, dtype=np.float64)
            np.add.at(diag_t, coo.col[on_diag], coo.data[on_diag])
            At = _plan_to_device(plan_t, diag_t, None, gather_mode)
    return _plan_to_device(plan, diag, At, gather_mode)


def csr_to_cells(a, **kw) -> CellOperator:
    """Host :class:`~kryst_tpu.matrix.csr.CSRMatrix` -> CellOperator."""
    import scipy.sparse as sp

    A = sp.csr_matrix(
        (a.data.astype(np.float64), a.indices, a.indptr), shape=a.shape
    )
    kw.setdefault("dtype", a.data.dtype)
    return scipy_to_cells(A, **kw)


# measured v5e slope timings (docs/STATUS.md): ELL's serial per-slot
# gather costs ~8.0 ns/slot at every scale (latency-bound, 65k and 1M
# both measured 7-8 ns). The cell kernel's rate depends on residency:
# ~1.5 ns per PADDED record entry while the (val, lrow, lcol) arrays fit
# in VMEM (65k expander: 0.97 ms over 0.64M padded entries — 3.3x FASTER
# than ELL even at k=7), ~4.5 ns once they stream from HBM (1M expander,
# R=1024/W=128/P=4: 81 ms over 19.2M padded vs ELL 57 ms over 7.34M
# slots — cells lose at low k there and only win on wide-k matrices such
# as densified AMG coarse levels).
ELL_GATHER_NS = 8.0
CELL_ENTRY_NS_VMEM = 1.5
CELL_ENTRY_NS_HBM = 4.5
_CELL_VMEM_BYTES = 64 << 20  # resident-threshold for the 12 B/entry plan


def _cell_entry_ns(padded_entries: float) -> float:
    return (
        CELL_ENTRY_NS_VMEM
        if padded_entries * 12 <= _CELL_VMEM_BYTES
        else CELL_ENTRY_NS_HBM
    )


def cells_if_faster(
    A,
    *,
    ell_width: int,
    dtype=np.float32,
    transpose: str = "auto",
    R="auto",
    W: int = 128,
    max_pad_ratio: float = 6.0,
) -> Optional[CellOperator]:
    """Build a :class:`CellOperator` only when the measured-rate cost
    model says it beats ELL at width ``ell_width``; return ``None`` when
    ELL (or nothing sparse) should be used instead.

    The pre-check assumes an optimistic 2.0x padding ratio (measured
    plans land at 2.0-3.5x) so hopeless cases skip the host planning
    pass; after planning, the exact padded size decides.
    """
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    m, _ = A.shape
    nnz = A.nnz
    ell_cost = m * max(ell_width, 1) * ELL_GATHER_NS
    if nnz < 50_000 or ell_cost <= nnz * 2.0 * _cell_entry_ns(nnz * 2.0):
        return None
    try:
        op = scipy_to_cells(
            A, dtype=dtype, R=R, W=W, transpose=transpose,
            max_pad_ratio=max_pad_ratio,
        )
    except ValueError:
        return None
    if ell_cost <= op.lrow.size * _cell_entry_ns(op.lrow.size):
        return None
    return op
