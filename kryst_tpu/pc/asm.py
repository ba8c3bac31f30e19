"""Additive Schwarz preconditioner (overlapping domain decomposition).

TPU-native redesign of the reference AdditiveSchwarz
(src/preconditioner/asm.rs, PETSc PCASM-inspired): user subdomains or a
uniform row partition (asm.rs:45-57), per-block submatrix extraction with a
dense inner solve (asm.rs:59-65), block solutions **summed** into the
global result (asm.rs:76-116). Blocks are padded to a common size and
solved as one vmapped batched LU — the reference's Rayon task-parallel
loop becomes a single batched kernel.

Improvement over the reference (documented): the reference's ``overlap``
field is dead configuration — subdomains are never grown (asm.rs:19-20).
Here ``overlap=k`` actually grows each subdomain by k layers of sparsity-
graph adjacency, which is the entire point of ASM.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np
from jax import Array
from jax.tree_util import register_dataclass

from kryst_tpu.matrix.csr import CSRMatrix


def grow_subdomain(a: CSRMatrix, rows: np.ndarray, overlap: int) -> np.ndarray:
    """Grow a row set by ``overlap`` layers of adjacency (vectorized: the
    concatenated nnz spans of the current rows via a repeat/cumsum flat
    gather — no per-row Python loop)."""
    current = np.asarray(rows, dtype=np.int64)
    widths = np.diff(a.indptr)
    for _ in range(overlap):
        lens = widths[current]
        starts = a.indptr[current]
        total = int(lens.sum())
        if total:
            offs = np.arange(total, dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
            )
            nbrs = a.indices[np.repeat(starts, lens) + offs]
            current = np.unique(np.concatenate([current, nbrs]))
    return current


@dataclasses.dataclass(frozen=True)
class AdditiveSchwarzPC:
    lu: Array  # (nb, bmax, bmax)
    piv: Array  # (nb, bmax)
    idx: Array  # (nb, bmax), -1 padded
    weight: Array  # (n,) 1/overlap-count for restricted variant, or ones
    n: int = dataclasses.field(metadata=dict(static=True))

    def apply(self, r: Array) -> Array:
        valid = self.idx >= 0
        gi = jnp.where(valid, self.idx, 0)
        rb = jnp.where(valid, r[gi], 0.0)
        xb = jax.vmap(lambda lu, piv, b: jsl.lu_solve((lu, piv), b))(
            self.lu, self.piv, rb
        )
        z = jnp.zeros_like(r)
        z = z.at[gi].add(jnp.where(valid, xb, 0.0))  # additive: overlaps sum
        return z * self.weight

    @staticmethod
    def setup(
        a: CSRMatrix,
        subdomains: Optional[Sequence[np.ndarray]] = None,
        nblocks: int = 8,
        overlap: int = 1,
        weighted: bool = False,
        dtype=None,
    ) -> "AdditiveSchwarzPC":
        """``weighted=True`` gives the scaled (partition-of-unity) variant —
        note this makes M NONSYMMETRIC (use with GMRES/BiCGStab, not PCG);
        False matches the reference's plain symmetric summation
        (asm.rs:88-98), the right choice for CG."""
        n = a.shape[0]
        dtype = dtype or a.data.dtype
        if subdomains is None:
            bounds = np.linspace(0, n, nblocks + 1).astype(np.int64)
            subdomains = [
                np.arange(bounds[k], bounds[k + 1]) for k in range(nblocks)
            ]
            subdomains = [s for s in subdomains if len(s)]
        subdomains = [grow_subdomain(a, s, overlap) for s in subdomains]
        from kryst_tpu.pc._blocks import batched_dense_blocks

        mats, idx = batched_dense_blocks(a, subdomains, dtype)
        counts = np.zeros(n, dtype=dtype)
        for s in subdomains:
            counts[s] += 1
        weight = (
            1.0 / np.maximum(counts, 1) if weighted else np.ones(n, dtype=dtype)
        )
        lu, piv = jax.vmap(jsl.lu_factor)(jnp.asarray(mats))
        return AdditiveSchwarzPC(
            lu=lu, piv=piv, idx=jnp.asarray(idx),
            weight=jnp.asarray(weight.astype(dtype)), n=n,
        )


register_dataclass(
    AdditiveSchwarzPC,
    data_fields=["lu", "piv", "idx", "weight"],
    meta_fields=["n"],
)
