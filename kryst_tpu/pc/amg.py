"""Smoothed-aggregation algebraic multigrid preconditioner.

TPU-native redesign of the reference's adaptive smoothed-aggregation AMG
(src/preconditioner/amg.rs, 934 LoC of dense-matrix multigrid). The design
split follows SURVEY §7: *setup on host* (NumPy/SciPy sparse — one-time,
shape-dynamic, sequential-greedy), *V-cycle on device* (static hierarchy of
ELL operators, unrolled over levels inside jit).

Setup pipeline per level (mirroring the reference's):
- adaptive strength threshold scaled by average anisotropy
  (amg.rs:447-498)
- strength matrix S(i,j) = |a_ij| / sqrt(a_ii a_jj) > theta
  (amg.rs:605-658)
- double-pairwise aggregation: pairwise match, coarse-graph rebuild,
  pairwise again, remap (amg.rs:664-789) — giving aggregates of <= 4
- piecewise-constant tentative prolongation (amg.rs:794-818), Jacobi
  smoothing P = (I - omega D^-1 A) P0 (amg.rs:502-525), row normalization
  ("energy minimization", amg.rs:529-565)
- R = P^T (amg.rs:135), RAP coarse operator (amg.rs:94)

Device V-cycle (amg.rs:200-250): nu_pre/nu_post damped-Jacobi smoothing,
restrict, recurse, prolongate-correct. Deviation (documented): the
coarsest solve is a cached dense LU instead of the reference's CG to 1e-10
(amg.rs:254-312) — exact, cheaper, and jit-friendly.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax import Array
from jax.tree_util import register_dataclass


from kryst_tpu.core.linop import ELLOperator
from kryst_tpu.matrix.csr import CSRMatrix


# ---------------------------------------------------------------------------
# host-side setup
# ---------------------------------------------------------------------------

def _to_scipy(a: CSRMatrix) -> sp.csr_matrix:
    return sp.csr_matrix(
        (a.data.astype(np.float64), a.indices, a.indptr), shape=a.shape
    )


def _filter_rap(A: sp.csr_matrix, drop_tol: float) -> sp.csr_matrix:
    """Operator-complexity control: drop coarse-operator entries below
    ``drop_tol`` x sqrt(rowmax_i * rowmax_j) and compensate each dropped
    ``a_ij`` by adding ``|a_ij|`` to the diagonal of its row.

    With the symmetric criterion both (i, j) and (j, i) drop together,
    so per dropped pair the net change is ``[[e, -a], [-a, e]]`` with
    ``e = |a|`` — positive semidefinite — hence ``A_filtered >= A`` in
    the Loewner order and SPD is preserved (row-sum-preserving lumping
    instead adds ``-e [[1,-1],[-1,1]]`` terms and was measured to make
    expander coarse operators indefinite, breaking PCG immediately).

    The reference never needs this because its dense-matrix multigrid
    (amg.rs) pays n^2 regardless; here an expander-graph RAP densifies
    levels (measured: level 2 of the 65k expander hierarchy reached
    k = n = 4860, a 177 ms ELL matvec) and filtering is the standard
    smoothed-aggregation countermeasure.
    """
    if drop_tol <= 0:
        return A
    # CSR-native throughout: the COO round-trip + per-nnz sqrt + repeated
    # fancy gathers cost 26 s of a 39 s setup at 65k (expander RAPs carry
    # millions of entries before filtering prunes them)
    Ac = A.tocsr()
    Ac.sum_duplicates()
    n = Ac.shape[0]
    from kryst_tpu import native

    nat = native.filter_rap(
        Ac.indptr, Ac.indices, Ac.data, n, float(drop_tol)
    )
    if nat is not None:
        # single C++ pass: the numpy form below allocates ~10 nnz-sized
        # temporaries, and on this 1-core host first-touch page faults made
        # it 39-46 s of the 59 s 65k-expander AMG setup (profiled)
        optr, oind, odat = nat
        return sp.csr_matrix((odat, oind, optr), shape=A.shape)
    absd = np.abs(Ac.data)
    nnz_row = np.diff(Ac.indptr)
    rowmax = np.zeros(n)
    has = nnz_row > 0
    if has.any():
        rowmax[has] = np.maximum.reduceat(absd, Ac.indptr[:-1][has])
    rows = np.repeat(np.arange(n, dtype=np.int64), nnz_row)
    cols = Ac.indices
    # symmetric criterion |a_ij| >= tol*sqrt(rowmax_i*rowmax_j), squared
    # to skip the per-nnz sqrt; a row-relative test would drop a_ij but
    # keep a_ji, destroying the symmetry PCG needs
    keep = (
        absd * absd >= (drop_tol * drop_tol) * rowmax[rows] * rowmax[cols]
    ) | (rows == cols)
    lump = np.bincount(rows, weights=np.where(keep, 0.0, absd), minlength=n)
    # kept entries stay in CSR order -> build the filtered CSR directly
    indptr2 = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows[keep], minlength=n), out=indptr2[1:])
    Af = sp.csr_matrix(
        (Ac.data[keep], cols[keep], indptr2), shape=A.shape
    ) + sp.diags(lump)
    return Af.tocsr()


def _truncate_p(
    P: sp.csr_matrix, drop_tol: float, max_per_row: int = 0
) -> sp.csr_matrix:
    """Prolongation truncation: drop |p_ij| < drop_tol x (row max) and —
    when ``max_per_row`` is set — everything past the ``max_per_row``
    largest entries of each row, then rescale each row so its sum is
    preserved (constant vectors interpolate exactly, as before
    truncation).

    The row cap is what bounds SETUP cost, not just apply cost: without
    it the expander hierarchy's smoothed P reaches ~400 entries/row and
    the R@A@P products blow up to tens of millions of entries before
    `_filter_rap` can prune them (measured 60s of a 73s setup at 65k)."""
    if drop_tol <= 0 and not max_per_row:
        return P
    coo = P.tocoo()
    absd = np.abs(coo.data)
    Pc = P.tocsr()
    nnzr = np.diff(Pc.indptr)
    rowmax = np.zeros(P.shape[0])
    hasr = nnzr > 0
    if hasr.any():
        rowmax[hasr] = np.maximum.reduceat(np.abs(Pc.data), Pc.indptr[:-1][hasr])
    keep = absd >= drop_tol * rowmax[coo.row]
    if max_per_row:
        order = np.lexsort((-absd, coo.row))
        row_sorted = coo.row[order]
        starts = np.flatnonzero(
            np.r_[True, row_sorted[1:] != row_sorted[:-1]]
        ) if len(row_sorted) else np.zeros(0, np.int64)
        counts = np.diff(np.r_[starts, len(row_sorted)])
        within = np.arange(len(order)) - np.repeat(starts, counts)
        pos = np.empty(len(order), dtype=np.int64)
        pos[order] = within
        keep &= pos < max_per_row
    oldsum = np.bincount(coo.row, weights=coo.data, minlength=P.shape[0])
    newsum = np.bincount(
        coo.row, weights=np.where(keep, coo.data, 0.0), minlength=P.shape[0]
    )
    safe = np.abs(newsum) > 1e-12 * np.maximum(np.abs(oldsum), 1e-300)
    scale = np.where(safe, oldsum / np.where(safe, newsum, 1.0), 1.0)
    # a near-cancelling row would get a huge/sign-flipping rescale; keep
    # such rows unscaled instead of amplifying their surviving entries
    scale = np.where((np.abs(scale) < 0.25) | (np.abs(scale) > 4.0), 1.0, scale)
    data = coo.data[keep] * scale[coo.row[keep]]
    return sp.csr_matrix(
        (data, (coo.row[keep], coo.col[keep])), shape=P.shape
    ).tocsr()


def _strength_matrix(A: sp.csr_matrix, theta: float) -> sp.csr_matrix:
    """S(i,j) = |a_ij| / sqrt(a_ii * a_jj) > theta (amg.rs:605-658)."""
    d = np.asarray(A.diagonal())
    d = np.where(d != 0, np.abs(d), 1.0)
    coo = A.tocoo()
    scale = np.sqrt(d[coo.row] * d[coo.col])
    s = np.abs(coo.data) / scale
    keep = (s > theta) & (coo.row != coo.col)
    return sp.csr_matrix(
        (s[keep], (coo.row[keep], coo.col[keep])), shape=A.shape
    )


def _adaptive_theta(A: sp.csr_matrix, base: float) -> float:
    """Scale the base threshold by the average anisotropy
    max_offdiag / diag (amg.rs:447-498)."""
    d = np.abs(np.asarray(A.diagonal()))
    d = np.where(d != 0, d, 1.0)
    B = A.tocsr(copy=True)
    B.setdiag(0)
    B.eliminate_zeros()
    if B.nnz == 0:
        return base
    max_off = np.abs(B).max(axis=1).toarray().ravel()
    aniso = float(np.mean(max_off / d))
    return float(np.clip(base * aniso, 0.01, 0.5))


def _pairwise_aggregate(S: sp.csr_matrix) -> np.ndarray:
    """Greedy pairwise matching on the strength graph: each unmatched node
    grabs its strongest unmatched neighbor (amg.rs:664-731 pairwise pass)."""
    n = S.shape[0]
    agg = -np.ones(n, dtype=np.int64)
    Sr = S.tocsr()
    order = np.argsort(np.diff(Sr.indptr))  # fewest strong connections first
    next_agg = 0
    for i in order:
        if agg[i] >= 0:
            continue
        cols = Sr.indices[Sr.indptr[i] : Sr.indptr[i + 1]]
        vals = Sr.data[Sr.indptr[i] : Sr.indptr[i + 1]]
        free = agg[cols] < 0
        if free.any():
            j = cols[free][np.argmax(vals[free])]
            agg[i] = agg[j] = next_agg
        else:
            agg[i] = next_agg  # singleton
        next_agg += 1
    return agg


def _aggregate(A: sp.csr_matrix, theta: float) -> np.ndarray:
    """Double-pairwise aggregation (amg.rs:664-789): two matching rounds
    composed through the intermediate coarse graph."""
    S = _strength_matrix(A, theta)
    agg1 = _pairwise_aggregate(S)
    n1 = int(agg1.max()) + 1
    # coarse graph of the first pairing
    P1 = sp.csr_matrix(
        (np.ones(len(agg1)), (np.arange(len(agg1)), agg1)), shape=(A.shape[0], n1)
    )
    A1 = (P1.T @ A @ P1).tocsr()
    S1 = _strength_matrix(A1, theta)
    agg2 = _pairwise_aggregate(S1)
    return agg2[agg1]  # remap (amg.rs:785-789)


def _smoothed_prolongation(
    A: sp.csr_matrix, agg: np.ndarray, omega: float, row_normalize: bool = False
) -> sp.csr_matrix:
    """Jacobi-smoothed piecewise-constant prolongation (amg.rs:502-525,
    794-818). ``row_normalize=True`` reproduces the reference's
    "energy minimization" row scaling (amg.rs:529-565) — measured to
    *worsen* the V-cycle rate on Poisson (0.59 vs 0.46 per cycle), so the
    default deviates from the reference and skips it."""
    n = A.shape[0]
    nc = int(agg.max()) + 1
    P0 = sp.csr_matrix((np.ones(n), (np.arange(n), agg)), shape=(n, nc))
    d = np.asarray(A.diagonal())
    dinv = np.where(d != 0, 1.0 / np.where(d != 0, d, 1.0), 0.0)
    Dinv = sp.diags(dinv)
    P = (P0 - omega * (Dinv @ (A @ P0))).tocsr()
    if row_normalize:
        rs = np.asarray(np.abs(P).sum(axis=1)).ravel()
        rs = np.where(rs > 0, rs, 1.0)
        P = (sp.diags(1.0 / rs) @ P).tocsr()
    return P


def _scipy_to_unstructured(A: sp.spmatrix, dtype, need_rmatvec: bool = False):
    """Device format for a matrix with no exploitable diagonal structure.

    Thin wrapper over the SHARED cost-model cascade
    (kryst_tpu/matrix/formats.py): dense MXU matvec -> cell layout ->
    ELL, all thresholds measured on v5e. AMG transfer operators default
    to matvec-only plans (need_rmatvec=False) to halve plan memory.
    """
    from kryst_tpu.matrix.formats import pick_unstructured

    return pick_unstructured(A, dtype, need_rmatvec=need_rmatvec)


def _scipy_to_ell(A: sp.spmatrix, dtype) -> ELLOperator:
    from kryst_tpu.matrix.formats import scipy_to_ell

    return scipy_to_ell(A, dtype)


# ---------------------------------------------------------------------------
# device hierarchy
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AMGLevel:
    """One V-cycle level. ``A`` is THIS level's (fine) operator — note the
    reference stores it under the confusing name ``coarse_matrix``
    (amg.rs:96-101, SURVEY quirk 8); we name it honestly."""

    A: ELLOperator
    P: ELLOperator  # prolongation (n_fine, n_coarse)
    R: ELLOperator  # restriction = P^T (n_coarse, n_fine)
    inv_diag: Array

    def prolong(self, xc: Array) -> Array:
        return self.P.matvec(xc)

    def restrict(self, r: Array) -> Array:
        return self.R.matvec(r)


register_dataclass(AMGLevel, data_fields=["A", "P", "R", "inv_diag"], meta_fields=[])


@dataclasses.dataclass(frozen=True)
class AMGFastLevel:
    """TPU fast-path level: DIA operator (when the aggregated matrix stays
    diagonal-sparse) + *functional* smoothed-aggregation transfers.

    The explicit ELL P/R matvecs are n*k-element gathers — the measured
    ~2 GB/s TPU cliff. But with row normalization off (the default), the
    smoothed prolongation factors exactly:

        P xc = (I - omega D^-1 A) P0 xc,     P0 xc = xc[agg]   (one gather)
        P^T r = P0^T (I - omega A^T D^-1) r, P0^T v = scatter-add by agg

    so each transfer costs one n-element gather/scatter plus one (DIA,
    gather-free) matvec instead of an n*k-element gather.
    """

    A: object  # DIAOperator (preferred) or ELLOperator fallback
    inv_diag: Array
    agg: Array  # (n_fine,) int32 aggregate index
    nc: int = dataclasses.field(metadata=dict(static=True))
    p_omega: float = dataclasses.field(metadata=dict(static=True))

    def prolong(self, xc: Array) -> Array:
        t = xc[self.agg]
        return t - self.p_omega * self.inv_diag * self.A.matvec(t)

    def restrict(self, r: Array) -> Array:
        v = r - self.p_omega * self.A.rmatvec(self.inv_diag * r)
        return jnp.zeros(self.nc, dtype=r.dtype).at[self.agg].add(v)


register_dataclass(
    AMGFastLevel,
    data_fields=["A", "inv_diag", "agg"],
    meta_fields=["nc", "p_omega"],
)


@dataclasses.dataclass(frozen=True)
class AMGPC:
    levels: Tuple[AMGLevel, ...]
    coarse_inv: Array  # explicit inverse, computed on HOST in f64
    nu_pre: int = dataclasses.field(metadata=dict(static=True))
    nu_post: int = dataclasses.field(metadata=dict(static=True))
    smooth_omega: float = dataclasses.field(metadata=dict(static=True))
    #: optional RCM permutation of the FINEST level's row space (set when
    #: level 0 is only diagonal-sparse after reordering): apply() permutes
    #: r in and z out — two n-element gathers per V-cycle, vs per-SMOOTH
    #: n*k-element gathers on the unpermuted ELL path
    perm0: Tuple[Array, ...] = ()  # () or (perm, iperm)
    # Chebyshev smoothing weight schedules (see pc/gmg.py
    # chebyshev_omegas): pre in root order, post REVERSED so the V-cycle
    # stays self-adjoint when nu_pre == nu_post
    smoother: str = dataclasses.field(
        default="jacobi", metadata=dict(static=True)
    )
    cheb_pre: Tuple[Tuple[float, ...], ...] = dataclasses.field(
        default=(), metadata=dict(static=True)
    )
    cheb_post: Tuple[Tuple[float, ...], ...] = dataclasses.field(
        default=(), metadata=dict(static=True)
    )

    def _omegas(self, l: int, nu: int, post: bool):
        from kryst_tpu.pc.gmg import smoothing_omegas

        return smoothing_omegas(
            self.smoother, self.smooth_omega, self.cheb_pre,
            self.cheb_post, l, nu, post,
        )

    def _smooth(self, l: int, z: Array, r: Array, nu: int,
                z_is_zero: bool = False, post: bool = False) -> Array:
        lvl = self.levels[l]
        for k, om in enumerate(self._omegas(l, nu, post)):
            if z_is_zero and k == 0:
                # exact shortcut: A·0 = 0 (saves one matvec per level/cycle)
                z = om * lvl.inv_diag * r
            elif hasattr(lvl.A, "smooth_jacobi"):
                # DIA fast levels: fused streamed smoothing (ops/streamed.py)
                z = lvl.A.smooth_jacobi(z, r, lvl.inv_diag, om)
            else:
                z = z + om * lvl.inv_diag * (r - lvl.A.matvec(z))
        return z

    def _vcycle(self, l: int, r: Array) -> Array:
        if l == len(self.levels):
            # host-f64 explicit inverse + HIGHEST-precision matmul: device
            # f32 LU on TPU runs at reduced matmul precision and breaks the
            # PC's SPD property (see pc/gmg.py)
            import jax.lax as lax_

            return jnp.dot(self.coarse_inv, r, precision=lax_.Precision.HIGHEST)
        lvl = self.levels[l]
        z = self._smooth(l, jnp.zeros_like(r), r, self.nu_pre, z_is_zero=True)
        resid = r - lvl.A.matvec(z)  # amg.rs:213-224
        rc = lvl.restrict(resid)  # amg.rs:226-227
        zc = self._vcycle(l + 1, rc)  # amg.rs:229-234
        z = z + lvl.prolong(zc)  # amg.rs:236-247
        return self._smooth(l, z, r, self.nu_post, post=True)

    def apply(self, r: Array) -> Array:
        if self.perm0:
            perm, iperm = self.perm0
            return self._vcycle(0, r[perm])[iperm]
        return self._vcycle(0, r)

    @staticmethod
    def setup(
        a: CSRMatrix,
        max_levels: int = 10,
        coarse_size: int = 16,
        theta: float = 0.08,
        adaptive_theta: bool = True,
        nu_pre: int = 1,
        nu_post: int = 1,
        smooth_omega: float = 2.0 / 3.0,
        p_omega: float = 2.0 / 3.0,
        row_normalize: bool = False,
        fast_transfers: bool = True,
        max_dia_offsets: int = 512,
        smoother: str = "jacobi",
        cheb_alpha: float = 4.0,
        dtype=None,
        rap_drop_tol="auto",
        p_drop_tol="auto",
    ) -> "AMGPC":
        """``fast_transfers``: store levels as :class:`AMGFastLevel`
        (functional agg-based transfers + DIA operators when the level's
        diagonal structure allows) — the TPU fast path. Requires
        ``row_normalize=False`` (the explicit-P scaling does not factor);
        automatically disabled otherwise. RAP always uses the explicit P,
        so the hierarchy is identical either way.

        Levels whose operator is NOT diagonal-sparse in natural order are
        retried under a reverse-Cuthill-McKee reordering (``rcm=True``):
        a banded permuted operator becomes DIA (gather-free), the agg maps
        of adjacent levels are relabeled consistently ON HOST (zero runtime
        cost), and only a finest-level permutation costs anything at apply
        time (two n-gathers per V-cycle — see :attr:`AMGPC.perm0`). This
        takes unstructured (bcsstk-like) hierarchies off the ~2 GB/s TPU
        ELL-gather cliff."""
        dtype = dtype or a.data.dtype
        A = _to_scipy(a)
        use_fast = fast_transfers and not row_normalize
        rcm = True

        # -------- pass 1 (host): hierarchy + per-level storage decisions
        plans: List[dict] = []
        for _ in range(max_levels):
            if A.shape[0] <= coarse_size:
                break
            th = _adaptive_theta(A, theta) if adaptive_theta else theta
            agg = _aggregate(A, th)
            nc = int(agg.max()) + 1
            if nc >= max(1, int(0.9 * A.shape[0])):
                # (near-)stalled: every further level costs a smoother +
                # transfer round for <10% size reduction (the filtered
                # expander hierarchy ground through 1084->993->950->931->
                # 925 before this guard); stop and let the dense coarse
                # solve take over
                break
            P = _smoothed_prolongation(A, agg, p_omega, row_normalize)
            # -- operator-complexity control (auto: engage only when the
            # hierarchy densifies, so regular PDE hierarchies — and their
            # reference-parity iteration counts — are untouched)
            p_mean = P.nnz / max(P.shape[0], 1)
            p_tol = (
                (0.02 if p_mean > 16 else 0.0)
                if p_drop_tol == "auto" else p_drop_tol
            )
            if p_tol:
                P = _truncate_p(
                    P, p_tol,
                    max_per_row=12 if p_drop_tol == "auto" else 0,
                )
            R = P.T.tocsr()
            d = np.asarray(A.diagonal())
            inv_d = np.where(d != 0, 1.0 / np.where(d != 0, d, 1.0), 0.0)
            A_dia, perm = None, None
            if use_fast:
                from kryst_tpu.ops.dia import scipy_to_dia

                # DIA stores ndiag * n entries: cap the dense-plane budget
                # (~256 MB f32) as well as the raw offset count; ALSO cap
                # at n/4 — a small coarse operator with hundreds of
                # offsets "fits" the raw cap but its matvec unrolls into
                # one shifted-add per offset (a filtered expander's
                # 623-dof level hit ~500 offsets: minutes of XLA compile,
                # ~25 us launch latency per offset). Such levels belong
                # on the dense/cell path instead.
                budget = max(32, 64_000_000 // max(A.shape[0], 1))
                cap = min(max_dia_offsets, budget, max(32, A.shape[0] // 4))
                try:
                    A_dia = scipy_to_dia(A, max_offsets=cap, dtype=dtype)
                except ValueError:
                    if rcm:
                        from scipy.sparse.csgraph import reverse_cuthill_mckee

                        p = np.asarray(
                            reverse_cuthill_mckee(A, symmetric_mode=False),
                            dtype=np.int64,
                        )
                        try:
                            A_dia = scipy_to_dia(
                                A[p][:, p].tocsr(), max_offsets=cap, dtype=dtype
                            )
                            perm = p
                        except ValueError:
                            A_dia = None  # banded even after RCM is too wide:
                            # fall back to the explicit ELL level
            plans.append(
                dict(
                    A=A, agg=agg, nc=nc, P=P, R=R, inv_d=inv_d,
                    A_dia=A_dia, perm=perm,
                )
            )
            fine_mean = A.nnz / max(A.shape[0], 1)
            A = (R @ A @ P).tocsr()  # RAP (amg.rs:94)
            c_mean = A.nnz / max(A.shape[0], 1)
            rap_tol = (
                (0.02 if c_mean > max(32.0, 4.0 * fine_mean) else 0.0)
                if rap_drop_tol == "auto" else rap_drop_tol
            )
            if rap_tol:
                A = _filter_rap(A, rap_tol)

        # -------- pass 2: device levels with consistently relabeled maps.
        # If level l+1 is stored permuted by p, level l's agg values are
        # relabeled by iperm_{l+1}, and level l's own rows follow its own
        # perm — all free host work.
        levels: List[AMGLevel] = []
        perm0 = ()
        cheb_ubs: List[float] = []
        for li, pl_ in enumerate(plans):
            if smoother == "chebyshev":
                # Gershgorin bound on lambda_max(D^-1 A) (see pc/gmg.py)
                A_l = pl_["A"].tocsr()
                rowsum = np.asarray(np.abs(A_l).sum(axis=1)).ravel()
                ub = float(np.max(rowsum * np.abs(pl_["inv_d"])))
                cheb_ubs.append(max(ub, 1e-12))
            perm_self = pl_["perm"]
            perm_next = plans[li + 1]["perm"] if li + 1 < len(plans) else None
            agg = pl_["agg"]
            if perm_next is not None:
                iperm_next = np.empty_like(perm_next)
                iperm_next[perm_next] = np.arange(len(perm_next))
                agg = iperm_next[agg]
            if pl_["A_dia"] is not None:
                inv_d = pl_["inv_d"]
                if perm_self is not None:
                    agg = agg[perm_self]
                    inv_d = inv_d[perm_self]
                    if li == 0:
                        iperm0 = np.empty_like(perm_self)
                        iperm0[perm_self] = np.arange(len(perm_self))
                        perm0 = (
                            jnp.asarray(perm_self.astype(np.int32)),
                            jnp.asarray(iperm0.astype(np.int32)),
                        )
                levels.append(
                    AMGFastLevel(
                        A=pl_["A_dia"],
                        inv_diag=jnp.asarray(inv_d.astype(dtype)),
                        agg=jnp.asarray(agg.astype(np.int32)),
                        nc=pl_["nc"],
                        p_omega=p_omega,
                    )
                )
            else:
                P, R = pl_["P"], pl_["R"]
                if perm_next is not None:
                    P = P[:, perm_next].tocsr()
                    R = R[perm_next].tocsr()
                levels.append(
                    AMGLevel(
                        A=_scipy_to_unstructured(pl_["A"].tocsr(), dtype),
                        P=_scipy_to_unstructured(P, dtype),
                        R=_scipy_to_unstructured(R, dtype),
                        inv_diag=jnp.asarray(pl_["inv_d"].astype(dtype)),
                    )
                )
        if A.shape[0] > max(coarse_size * 8, 4096):
            # coarsening stalled (e.g. strongly diagonally dominant matrix
            # where every connection falls below theta): a dense inverse of
            # the remaining matrix would OOM/hang, so fail loudly instead
            raise ValueError(
                f"AMG coarsening stalled at n={A.shape[0]} "
                f"(target coarse_size={coarse_size}); the matrix may be too "
                "diagonally dominant for theta-strength aggregation — lower "
                "theta, or use a single-level PC (jacobi/chebyshev/ilu0)"
            )
        coarse_inv = np.linalg.inv(A.toarray())  # host, f64
        cheb_pre = cheb_post = ()
        if smoother == "chebyshev":
            from kryst_tpu.pc.gmg import chebyshev_omegas

            cheb_pre = tuple(
                chebyshev_omegas(ub, nu_pre, cheb_alpha) for ub in cheb_ubs
            )
            cheb_post = tuple(
                chebyshev_omegas(ub, nu_post, cheb_alpha) for ub in cheb_ubs
            )
        return AMGPC(
            levels=tuple(levels),
            coarse_inv=jnp.asarray(coarse_inv.astype(dtype)),
            nu_pre=nu_pre,
            nu_post=nu_post,
            smooth_omega=smooth_omega,
            perm0=perm0,
            smoother=smoother,
            cheb_pre=cheb_pre,
            cheb_post=cheb_post,
        )


register_dataclass(
    AMGPC,
    data_fields=["levels", "coarse_inv", "perm0"],
    meta_fields=["nu_pre", "nu_post", "smooth_omega", "smoother",
                 "cheb_pre", "cheb_post"],
)
