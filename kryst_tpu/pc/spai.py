"""SPAI — sparse approximate inverse preconditioner.

TPU-native redesign of the reference ApproxInv
(src/preconditioner/approxinv.rs): compute M with A·M ≈ I column by
column, each column a small least-squares problem restricted to a chosen
sparsity pattern (approxinv.rs:152-248), then apply as a sparse matvec
(approxinv.rs:268-298).

The reference probes A with unit vectors and solves per-column systems
serially with faer LU/QR. Here the local systems are assembled on host
into padded (nb, rmax+kmax, kmax) tensors and solved as ONE vmapped QR
least-squares batch — "maps beautifully to vmapped QR" (SURVEY §7 step 5).
Padded columns are pinned to zero through dedicated unit rows so a single
fixed-shape batch handles ragged patterns exactly.

Pattern selection mirrors the reference's Manual/Auto split
(approxinv.rs:303-324): "auto" uses the sparsity of A^T's rows (the
pattern of each column of A).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np
from jax import Array
from jax.tree_util import register_dataclass

from kryst_tpu.core.linop import ELLOperator
from kryst_tpu.matrix.csr import CSRMatrix


@dataclasses.dataclass(frozen=True)
class SPAIPC:
    M: ELLOperator  # the approximate inverse, applied as z = M r

    def apply(self, r: Array) -> Array:
        return self.M.matvec(r)


register_dataclass(SPAIPC, data_fields=["M"], meta_fields=[])


def spai_setup(
    a: CSRMatrix,
    pattern: Optional[Sequence[np.ndarray]] = None,
    dtype=None,
) -> SPAIPC:
    """Build M column-by-column: min ||A[:,P_j] m - e_j||_2, supp(m)=P_j."""
    n = a.shape[0]
    dtype = dtype or a.data.dtype
    at = a.transpose()

    if pattern is None:  # Auto: pattern of column j of A (approxinv.rs:303-324)
        pattern = [at.row(j)[0].astype(np.int64) for j in range(n)]
    pattern = [np.asarray(p, dtype=np.int64) for p in pattern]
    kmax = max(max((len(p) for p in pattern), default=1), 1)

    # rows touched by each local system: union of column patterns of A[:,P_j]
    row_sets: List[np.ndarray] = []
    for j in range(n):
        if len(pattern[j]) == 0:
            row_sets.append(np.array([j], dtype=np.int64))
            continue
        rows = np.unique(np.concatenate([at.row(int(c))[0] for c in pattern[j]]))
        row_sets.append(rows)
    rmax = max(max(len(r) for r in row_sets), 1)

    # assemble padded local systems; bottom kmax rows pin padded cols to 0
    nb = n
    Aloc = np.zeros((nb, rmax + kmax, kmax), dtype=dtype)
    rhs = np.zeros((nb, rmax + kmax), dtype=dtype)
    for j in range(n):
        P = pattern[j]
        R = row_sets[j]
        pos = {int(r): i for i, r in enumerate(R)}
        for cidx, c in enumerate(P):
            rws, vls = at.row(int(c))  # column c of A
            for rr, vv in zip(rws, vls):
                Aloc[j, pos[int(rr)], cidx] = vv
        for cidx in range(len(P), kmax):
            Aloc[j, rmax + cidx, cidx] = 1.0  # pin padded columns
        if j in pos:
            rhs[j, pos[j]] = 1.0

    def solve_one(Aj, bj):
        q, r = jnp.linalg.qr(Aj, mode="reduced")
        return jsl.solve_triangular(r, q.T @ bj, lower=False)

    mvals = jax.vmap(solve_one)(jnp.asarray(Aloc), jnp.asarray(rhs))
    mvals = np.asarray(mvals)

    # assemble M (n x n) from columns: M[P_j, j] = m_j
    rows_out, cols_out, vals_out = [], [], []
    for j in range(n):
        P = pattern[j]
        rows_out.extend(P.tolist())
        cols_out.extend([j] * len(P))
        vals_out.extend(mvals[j, : len(P)].tolist())
    Mcsr = CSRMatrix.from_coo(
        rows_out, cols_out, np.asarray(vals_out, dtype=dtype), (n, n)
    )
    return SPAIPC(M=Mcsr.to_ell(dtype=dtype))
