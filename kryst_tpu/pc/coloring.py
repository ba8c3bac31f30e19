"""Graph coloring and level scheduling (host-side, NumPy).

TPU-native rework of the reference's coloring utilities
(src/utils/coloring.rs:7-74): distance-2 greedy coloring feeding
multicolor sweeps and block construction. Adds *level scheduling* for
triangular factors — the standard answer to "how do sequential
Gauss-Seidel/ILU sweeps parallelize on a data-parallel machine"
(SURVEY §2.6 item 6): rows in the same color/level are independent and
execute as one vectorized gather/compute/scatter step.
"""
from __future__ import annotations

from typing import List

import numpy as np

from kryst_tpu.matrix.csr import CSRMatrix


def extract_adjacency(a: CSRMatrix) -> List[np.ndarray]:
    """Row adjacency lists, excluding the diagonal (coloring.rs:7-20)."""
    adj = []
    for i in range(a.shape[0]):
        cols, _ = a.row(i)
        adj.append(cols[cols != i])
    return adj


def distance2_neighbors(adj: List[np.ndarray], i: int) -> np.ndarray:
    """Union of neighbors and neighbors-of-neighbors (coloring.rs:23-36)."""
    first = adj[i]
    if len(first) == 0:
        return first
    second = np.concatenate([adj[j] for j in first]) if len(first) else first
    nbrs = np.unique(np.concatenate([first, second]))
    return nbrs[nbrs != i]


def greedy_distance2_coloring(adj: List[np.ndarray]) -> np.ndarray:
    """Greedy distance-2 coloring (coloring.rs:39-53)."""
    n = len(adj)
    colors = -np.ones(n, dtype=np.int64)
    for i in range(n):
        nbrs = distance2_neighbors(adj, i)
        used = set(colors[nbrs[nbrs < n]].tolist())
        c = 0
        while c in used:
            c += 1
        colors[i] = c
    return colors


def greedy_distance1_coloring(adj: List[np.ndarray]) -> np.ndarray:
    """Distance-1 greedy coloring — sufficient for parallel Gauss-Seidel/SOR
    sweeps (rows of one color share no edge, so updates are independent)."""
    n = len(adj)
    colors = -np.ones(n, dtype=np.int64)
    for i in range(n):
        used = set(colors[adj[i]].tolist())
        c = 0
        while c in used:
            c += 1
        colors[i] = c
    return colors


def color_graph(a: CSRMatrix, distance: int = 2) -> np.ndarray:
    """Color the sparsity graph of ``a`` (coloring.rs:57-64).

    Dispatches to the native (C++) greedy kernel when available — identical
    deterministic ascending-row greedy, bitwise-equal colors (tested in
    tests/test_native.py) — and falls back to the Python implementation."""
    from kryst_tpu import native

    colors = native.color(a.indptr, a.indices, a.shape[0], distance)
    if colors is not None:
        return colors
    adj = extract_adjacency(a)
    if distance == 1:
        return greedy_distance1_coloring(adj)
    return greedy_distance2_coloring(adj)


def build_blocks_from_colors(colors: np.ndarray) -> List[np.ndarray]:
    """Group row indices by color (coloring.rs:67-74)."""
    ncolors = int(colors.max()) + 1 if len(colors) else 0
    return [np.nonzero(colors == c)[0] for c in range(ncolors)]


def _bucket_levels(level: np.ndarray, nlev: int) -> List[np.ndarray]:
    """Group row indices by level (ascending within each level) — stable
    argsort + split instead of one nonzero pass per level."""
    if nlev == 0:
        return []
    order = np.argsort(level, kind="stable")
    counts = np.bincount(level, minlength=nlev)
    return np.split(order, np.cumsum(counts)[:-1])


def level_schedule_lower(indptr, indices, n: int) -> List[np.ndarray]:
    """Level sets for a (strictly) lower-triangular pattern.

    ``level[i] = 1 + max(level[j])`` over dependencies ``j < i`` in row i.
    Rows within a level have no mutual dependency and solve in parallel.
    """
    from kryst_tpu import native

    nat = native.level_schedule(indptr, indices, n, lower=True)
    if nat is not None:
        return _bucket_levels(*nat)
    level = np.zeros(n, dtype=np.int64)
    for i in range(n):
        sl = slice(indptr[i], indptr[i + 1])
        deps = indices[sl]
        deps = deps[deps < i]
        if len(deps):
            level[i] = level[deps].max() + 1
    return [np.nonzero(level == l)[0] for l in range(int(level.max()) + 1 if n else 0)]


def level_schedule_upper(indptr, indices, n: int) -> List[np.ndarray]:
    """Level sets for a (strictly) upper-triangular pattern (reverse order)."""
    from kryst_tpu import native

    nat = native.level_schedule(indptr, indices, n, lower=False)
    if nat is not None:
        return _bucket_levels(*nat)
    level = np.zeros(n, dtype=np.int64)
    for i in range(n - 1, -1, -1):
        sl = slice(indptr[i], indptr[i + 1])
        deps = indices[sl]
        deps = deps[deps > i]
        if len(deps):
            level[i] = level[deps].max() + 1
    return [np.nonzero(level == l)[0] for l in range(int(level.max()) + 1 if n else 0)]


def pad_levels(levels: List[np.ndarray]) -> np.ndarray:
    """Pad level sets to a rectangular (nlev, w) int32 array, -1 padded."""
    if not levels:
        return np.zeros((0, 1), dtype=np.int32)
    w = max(len(l) for l in levels)
    out = -np.ones((len(levels), max(w, 1)), dtype=np.int32)
    for k, l in enumerate(levels):
        out[k, : len(l)] = l
    return out
