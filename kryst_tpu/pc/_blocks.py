"""Shared batched dense-block extraction for BlockJacobi/ASM setup.

Both preconditioners factor many small dense principal submatrices
(reference block_jacobi.rs:39-61, asm.rs:59-65). Per-block
``submatrix().todense()`` walks every block row in Python — O(n) Python
iterations across the partition — so the batch is extracted by the native
C++ kernel (native/kernels.cc::kn_extract_blocks) when available, with the
original per-block path as fallback/oracle.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from kryst_tpu import native
from kryst_tpu.matrix.csr import CSRMatrix


def batched_dense_blocks(
    a: CSRMatrix, blocks: Sequence[np.ndarray], dtype
) -> Tuple[np.ndarray, np.ndarray]:
    """Dense principal submatrices for a list of row-index sets.

    Returns ``(mats, idx)``: ``mats`` is (nb, bmax, bmax) with block k's
    submatrix in ``[:m, :m]`` and identity on the padded diagonal (so the
    batched LU stays nonsingular); ``idx`` is the (nb, bmax) int32 row-set
    array, -1 padded.
    """
    nb = len(blocks)
    bmax = max(len(b) for b in blocks)
    idx = -np.ones((nb, bmax), dtype=np.int64)
    for k, blk in enumerate(blocks):
        idx[k, : len(blk)] = np.asarray(blk)
    mats = native.extract_blocks(a.indptr, a.indices, a.data, a.shape[0], idx)
    if mats is not None:
        mats = mats.astype(dtype)
        kk, pp = np.nonzero(idx < 0)
        mats[kk, pp, pp] = 1.0
    else:
        mats = np.tile(np.eye(bmax, dtype=dtype), (nb, 1, 1))
        for k, blk in enumerate(blocks):
            blk = np.asarray(blk)
            sub = a.submatrix(blk).todense().astype(dtype)
            m = len(blk)
            mats[k, :m, :m] = sub
    return mats, idx.astype(np.int32)
