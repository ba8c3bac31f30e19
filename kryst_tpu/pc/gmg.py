"""Structured-grid (geometric) multigrid preconditioner — the gather-free
fast path for stencil problems.

Motivation: on TPU, XLA lowers arbitrary gathers to a serial ~7.5ns/element
loop, so the general AMG hierarchy (pc/amg.py, ELL operators) is
correctness-first but slow on device. For problems on structured grids —
the Poisson / convection-diffusion BASELINE configs — the whole multigrid
cycle can be expressed without a single gather:

- level operators in DIA form (ops/dia.py): shifted-slice SpMV;
- aggregation is *geometric* (2x2(x2) cell blocks), so the tentative
  prolongation P0 is grid upsampling (reshape+broadcast) and P0^T is
  block-sum downsampling (reshape+sum);
- the smoothed transfers P = (I - omega D^-1 A) P0 and R = P^T apply as
  [upsample -> DIA matvec -> diag scale], all vectorized.

Setup runs on host (SciPy): explicit P, Galerkin RAP, conversion of every
level to DIA (structured aggregation keeps all levels banded in
lexicographic order). The device V-cycle mirrors pc/amg.py (and the
reference's amg.rs:200-250): damped-Jacobi smoothing, restrict, recurse,
prolongate-correct, with a cached dense-LU coarsest solve.

Mathematically this *is* smoothed-aggregation AMG with a structured
aggregation map — same family as the reference (amg.rs), redesigned for
the hardware.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax import Array
from jax.tree_util import register_dataclass

from kryst_tpu.matrix.csr import CSRMatrix
from kryst_tpu.ops.dia import DIAOperator, scipy_to_dia


def _expansion_matrices(coarse: Tuple[int, ...], fine: Tuple[int, ...]):
    """Per-axis 0/1 expansion matrices E (nf, nc): E[i, i//2] = 1.

    P0 = E_x (x) E_y (x) E_z as a Kronecker product; applying it axis by
    axis is three small MXU matmuls. This formulation matters: the
    repeat/reshape upsampling and pad/reshape/sum downsampling forms cost
    2.9 ms at 100^3 when materialized inside the V-cycle (XLA lowers the
    interior-axis repeats to a pathological layout), while the tensordot
    form runs the same transfer in 48 us (measured, 45x)."""
    return tuple(
        jnp.asarray(_make_E(nf, nc)) for nf, nc in zip(fine, coarse)
    )


def _make_E(nf: int, nc: int) -> np.ndarray:
    E = np.zeros((nf, nc), np.float32)
    E[np.arange(nf), np.arange(nf) // 2] = 1.0
    return E


def _axis_matmul(E: Array, g: Array, ax: int) -> Array:
    # exact f32: default MXU precision is bf16-ish and puts ~1e-2 errors
    # into the transfer operators, breaking Galerkin consistency
    from jax import lax as lax_

    out = jnp.tensordot(E, jnp.moveaxis(g, ax, 0), axes=[[1], [0]],
                        precision=lax_.Precision.HIGHEST)
    return jnp.moveaxis(out, 0, ax)


def _upsample(xc: Array, coarse: Tuple[int, ...], fine: Tuple[int, ...],
              Es=None) -> Array:
    """Piecewise-constant grid upsampling (P0) via per-axis MXU matmuls."""
    g = xc.reshape(coarse)
    for ax, (nf, nc) in enumerate(zip(fine, coarse)):
        E = Es[ax] if Es is not None else jnp.asarray(_make_E(nf, nc))
        g = _axis_matmul(E, g, ax)
    return g.reshape(-1)


def _downsample_sum(xf: Array, coarse: Tuple[int, ...], fine: Tuple[int, ...],
                    Es=None) -> Array:
    """Block-sum downsampling (P0^T) via per-axis MXU matmuls."""
    g = xf.reshape(fine)
    for ax, (nf, nc) in enumerate(zip(fine, coarse)):
        E = Es[ax] if Es is not None else jnp.asarray(_make_E(nf, nc))
        g = _axis_matmul(E.T, g, ax)
    return g.reshape(-1)


@dataclasses.dataclass(frozen=True)
class GMGLevel:
    A: DIAOperator
    At: DIAOperator  # A^T as a first-class operator. For symmetric A this
    # IS A (same object, no extra memory). Built at setup because
    # DIAOperator.rmatvec constructs the transposed diagonals in-jit on
    # every call — ~4 ms/V-cycle at 8M dof — and cannot use the planned
    # streaming layout.
    inv_diag: Array
    Es: Tuple[Array, ...]  # per-axis expansion matrices (see _expansion_matrices)
    fine: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    coarse: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    p_omega: float = dataclasses.field(metadata=dict(static=True))
    smoothed: bool = dataclasses.field(default=True, metadata=dict(static=True))

    def prolong(self, xc: Array) -> Array:
        """P xc; smoothed: (I - omega D^-1 A) P0 xc, else P0 xc."""
        v = _upsample(xc, self.coarse, self.fine, self.Es)
        if not self.smoothed:
            return v
        return v - self.p_omega * self.inv_diag * self.A.matvec(v)

    def restrict(self, r: Array) -> Array:
        """P^T r; smoothed: P0^T (I - omega A^T D^-1) r.

        Uses rmatvec so the transfer is the exact transpose of ``prolong``
        for NONSYMMETRIC A too (Petrov-Galerkin consistency with the
        host-built RAP); for symmetric A this equals the matvec form."""
        if not self.smoothed:
            return _downsample_sum(r, self.coarse, self.fine, self.Es)
        v = r - self.p_omega * self.At.matvec(self.inv_diag * r)
        return _downsample_sum(v, self.coarse, self.fine, self.Es)


register_dataclass(
    GMGLevel,
    data_fields=["A", "At", "inv_diag", "Es"],
    meta_fields=["fine", "coarse", "p_omega", "smoothed"],
)


def chebyshev_omegas(ub: float, nu: int, alpha: float = 4.0):
    """Per-step damped-Jacobi weights realizing the degree-``nu``
    Chebyshev smoothing polynomial on [ub/alpha, ub].

    A Chebyshev polynomial shifted to a positive interval has REAL roots
    t_i, so the nu-step varying-weight Jacobi sweep
    ``z += (1/t_i) D^-1 (r - A z)`` has error operator
    ``prod_i (I - t_i^-1 D^-1 A)`` — exactly the scaled Chebyshev
    p_nu with p_nu(0) = 1 and |p_nu| <= 1/T_nu(theta/delta) on
    [ub/alpha, ub] (0.22 at nu=2, alpha=4, vs 0.69 for two omega=2/3
    Jacobi steps). This reuses the fused smooth_jacobi kernel unchanged —
    no new device code, just a weight schedule (Adams et al. 2003;
    the standard hypre/PETSc AMG smoother).

    ``ub`` must upper-bound lambda_max(D^-1 A) (Gershgorin suffices).
    """
    import math as _math

    lb = ub / alpha
    theta = 0.5 * (ub + lb)
    delta = 0.5 * (ub - lb)
    roots = [
        theta - delta * _math.cos(_math.pi * (2 * i - 1) / (2 * nu))
        for i in range(1, nu + 1)
    ]
    return tuple(1.0 / t for t in roots)


def smoothing_omegas(smoother, smooth_omega, cheb_pre, cheb_post,
                     l, nu, post):
    """Per-step smoothing weights for level ``l`` — THE single source of
    the Chebyshev schedule convention (GMGPC, AMGPC and ShardedGMGPC all
    delegate here so the post-REVERSAL rule that keeps the V-cycle
    self-adjoint cannot drift between them)."""
    if smoother == "chebyshev":
        oms = (cheb_post if post else cheb_pre)[l]
        return oms[::-1] if post else oms
    return (smooth_omega,) * nu


@dataclasses.dataclass(frozen=True)
class GMGPC:
    levels: Tuple[GMGLevel, ...]
    coarse_inv: Array  # explicit inverse, computed on HOST in f64
    nu_pre: int = dataclasses.field(metadata=dict(static=True))
    nu_post: int = dataclasses.field(metadata=dict(static=True))
    smooth_omega: float = dataclasses.field(metadata=dict(static=True))
    # smoother="chebyshev": per-level per-step weight schedules (see
    # chebyshev_omegas); pre-smoothing applies them in root order, post-
    # smoothing REVERSED — each factor (I - w D^-1 A) is self-adjoint in
    # the D inner product, so reversing makes the V-cycle self-adjoint
    # (SPD as a PCG preconditioner) when nu_pre == nu_post.
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
        return smoothing_omegas(
            self.smoother, self.smooth_omega, self.cheb_pre,
            self.cheb_post, l, nu, post,
        )

    def _smooth(self, l: int, z: Array, r: Array, nu: int,
                z_is_zero: bool = False, post: bool = False) -> Array:
        lvl = self.levels[l]
        for k, om in enumerate(self._omegas(l, nu, post)):
            if z_is_zero and k == 0:
                # exact shortcut: A·0 = 0, so the first step is a pure
                # diagonal scale — saves one full matvec per level per
                # V-cycle (~0.4 ms at 8M dof on the finest level)
                z = om * lvl.inv_diag * r
            elif hasattr(lvl.A, "smooth_jacobi"):
                # beyond-VMEM levels: SpMV + Jacobi update fused into one
                # streamed pass (ops/streamed.py epilogue)
                z = lvl.A.smooth_jacobi(z, r, lvl.inv_diag, om)
            else:
                z = z + om * lvl.inv_diag * (r - lvl.A.matvec(z))
        return z

    def _vcycle(self, l: int, r: Array) -> Array:
        if l == len(self.levels):
            # explicit-inverse matmul at HIGHEST precision: device LU in f32
            # runs TPU matmuls at reduced precision (measured 9e-4 coarse
            # solve residual), which breaks the PC's SPD property and trips
            # PCG's beta<0 breakdown — the host-f64 inverse avoids that
            import jax.lax as lax_

            return jnp.dot(self.coarse_inv, r, precision=lax_.Precision.HIGHEST)
        lvl = self.levels[l]
        z = self._smooth(l, jnp.zeros_like(r), r, self.nu_pre, z_is_zero=True)
        resid = r - lvl.A.matvec(z)
        zc = self._vcycle(l + 1, lvl.restrict(resid))
        z = z + lvl.prolong(zc)
        return self._smooth(l, z, r, self.nu_post, post=True)

    def apply(self, r: Array) -> Array:
        return self._vcycle(0, r)

    @staticmethod
    def setup(
        a: CSRMatrix,
        grid: Tuple[int, ...],
        max_levels: int = 12,
        coarse_size: int = 512,
        nu_pre: int = 1,
        nu_post: int = 1,
        smooth_omega: float = 2.0 / 3.0,
        p_omega: float = 2.0 / 3.0,
        max_offsets: int = 512,
        smooth_levels: int = 2,
        dtype=None,
        coeff_dtype=None,
        smoother: str = "jacobi",
        cheb_alpha: float = 4.0,
        symmetric: bool = None,
        rap: str = "host",
    ) -> "GMGPC":
        """``grid``: the structured grid shape whose lexicographic
        flattening indexes ``a`` (e.g. (nx, ny) / (nx, ny, nz)).

        ``smoother``: "jacobi" (fixed ``smooth_omega``) or "chebyshev" —
        per-step weights realizing the degree-nu Chebyshev polynomial on
        [lambda_max/cheb_alpha, lambda_max] per level (Gershgorin bound,
        exact on the host at setup); same fused kernel, much stronger
        smoothing per matvec (see chebyshev_omegas).

        ``coeff_dtype``: optional lower precision (e.g. ``jnp.bfloat16``)
        for the STREAMED coefficient panels of large level operators —
        halves the dominant HBM stream in the V-cycle. The level operators
        stay symmetric (deterministic rounding of symmetric data), so the
        V-cycle remains a fixed SPD-ish preconditioner; pair with
        solvers/refine.py when TRUE f64 accuracy is required.

        ``smooth_levels``: how many (finest) levels use the Jacobi-smoothed
        prolongation; deeper levels use plain (unsmoothed) aggregation.
        RAP is EXACT Galerkin everywhere — editing the coarse operator
        (stencil collapsing) was measured to make the V-cycle divergent at
        100^3 (rho > 1, identical on CPU f64), because it breaks the
        A-orthogonal-projection property of the coarse correction.
        Unsmoothed P below the first level keeps the operator reach <= 1
        per axis (<= 27 diagonals in 3-D) with Galerkin intact.

        ``symmetric``: None (default) detects symmetry of ``a`` with one
        O(nnz) pass; True/False asserts it (Galerkin RAP preserves the
        answer on every level either way). Skipping the pass saves ~27 s
        at 8M dof on this host.

        ``rap``: "host" computes every coarse operator with scipy CSR
        SpGEMM in f64 and uploads the panels; "probe" computes them ON
        THE DEVICE by exact stencil probing of P^T A P through the
        V-cycle's own transfer kernels (pc/rap_probe.py) — same Galerkin
        operators (in the level dtype's arithmetic), no host SpGEMM and
        no coarse-panel uploads (the dominant 8M setup costs). One
        precision caveat: the bottom-level dense inverse is computed (in
        f64 arithmetic) from the f32-rounded device-probed panel, while
        "host" inverts the f64 scipy RAP — the probe coarse solve
        therefore carries an f32 DATA floor (values, not arithmetic).
        Irrelevant as a preconditioner (the outer Krylov/refinement loop
        absorbs it — 8M refined-solve parity is 208 vs 209 inner
        iterations); pick rap="host" if the exact-f64 hierarchy itself
        is the product.
        """
        if rap not in ("host", "probe"):
            raise ValueError(f"rap must be 'host' or 'probe', got {rap!r}")
        from kryst_tpu.ops.dia import DIAOperator as _DIA

        if isinstance(a, _DIA):
            # device-born L0 (e.g. ops/dia.stencil_to_dia): no host CSR
            # exists, so only the device-probed RAP path can build the
            # hierarchy — and nothing needs to cross the host boundary
            # at all (the 8M Poisson setup wall was dominated by host
            # assembly + the ~340 MB panel upload, round-5 stage 13)
            if rap != "probe":
                raise ValueError(
                    "GMGPC.setup(DIAOperator) requires rap='probe' — the "
                    "host scipy RAP path needs a host CSR input"
                )
            if int(np.prod(grid)) != a.n:
                raise ValueError(f"grid {grid} does not match n={a.n}")
            dtype = dtype or a.dtype
            if np.dtype(dtype) != np.dtype(a.dtype):
                raise ValueError(
                    f"dtype {np.dtype(dtype)} != operator dtype {a.dtype}; "
                    "build the operator in the level dtype"
                )
            sym = a.symmetric if symmetric is None else bool(symmetric)
            return _probe_setup(
                a, grid, sym, max_levels, coarse_size, nu_pre, nu_post,
                smooth_omega, p_omega, max_offsets, smooth_levels, dtype,
                coeff_dtype, smoother, cheb_alpha,
            )
        dtype = dtype or a.data.dtype
        if int(np.prod(grid)) != a.shape[0]:
            raise ValueError(f"grid {grid} does not match n={a.shape[0]}")
        A = sp.csr_matrix(
            (a.data.astype(np.float64), a.indices, a.indptr), shape=a.shape
        )
        # symmetry is decided ONCE on the input: Galerkin RAP (P^T A P)
        # preserves it on every coarse level, so the per-level O(nnz)
        # |A - A^T| pass (~4.5 s at 1M dof) is redundant. ``symmetric=``
        # lets the caller assert it and skip even the one input pass
        # (~27 s at 8M dof: csr_minus_csr + abs, profiled round 4).
        if symmetric is None:
            asym = float(abs(A - A.T).max()) if A.nnz else 0.0
            sym = asym <= 1e-12 * max(1.0, float(abs(A).max()))
        else:
            sym = bool(symmetric)
        if rap == "probe":
            return _probe_setup(
                A, grid, sym, max_levels, coarse_size, nu_pre, nu_post,
                smooth_omega, p_omega, max_offsets, smooth_levels, dtype,
                coeff_dtype, smoother, cheb_alpha,
            )
        fine = tuple(grid)
        levels: List[GMGLevel] = []
        cheb_ubs: List[float] = []
        for lvl_idx in range(max_levels):
            n = A.shape[0]
            if n <= coarse_size or min(fine) <= 2:
                break
            coarse = tuple((f + 1) // 2 for f in fine)
            nc = int(np.prod(coarse))
            # geometric aggregation map: fine cell -> coarse cell.
            # agg = ravel_multi_index(i//2 per axis) as an outer sum of
            # per-axis stride terms — value-identical to the np.indices
            # form without its d x n int64 temporaries (16 s of the 8M
            # setup, profiled round 4)
            strides = np.cumprod((coarse + (1,))[::-1])[::-1][1:]
            axes = [
                (np.arange(f, dtype=np.int64) // 2) * s
                for f, s in zip(fine, strides)
            ]
            agg = axes[0]
            for ax in axes[1:]:
                agg = agg[..., None] + ax
            agg = agg.reshape(-1)
            # P0 has exactly one entry per row, in row order: build the CSR
            # arrays directly (the COO constructor re-sorts n entries)
            P0 = sp.csr_matrix(
                (np.ones(n), agg, np.arange(n + 1, dtype=np.int64)),
                shape=(n, nc),
            )
            d = np.asarray(A.diagonal())
            dinv = np.where(d != 0, 1.0 / np.where(d != 0, d, 1.0), 0.0)
            if smoother == "chebyshev":
                # Gershgorin upper bound on lambda_max(D^-1 A): max row
                # sum of |D^-1 A| — exact host arithmetic at setup
                rowsum = np.asarray(np.abs(A).sum(axis=1)).ravel()
                ub = float(
                    np.max(
                        np.where(d != 0, rowsum / np.maximum(np.abs(d), 1e-300), 0.0)
                    )
                )
                cheb_ubs.append(max(ub, 1e-12))
            smoothed = lvl_idx < smooth_levels
            if smoothed:
                AP0 = (A @ P0).tocsr()
                # diagonal scalings applied directly on the CSR data
                # (value-identical to the sp.diags matmuls — each output
                # entry is one product — without two O(nnz) csr_matmat
                # passes): rows of AP0 by dinv, columns of A by dinv.
                # indices/indptr are SHARED with the source (scipy allows
                # aliasing; only .data differs), and the p_omega scale runs
                # in place — scipy's `scalar * csr` would copy all three
                # arrays (profiled: copies + _mul_scalar were ~30% of a 1M
                # setup once the diags matmuls were gone)
                DinvAP0 = sp.csr_matrix(
                    (
                        AP0.data * np.repeat(dinv, np.diff(AP0.indptr)),
                        AP0.indices,
                        AP0.indptr,
                    ),
                    shape=AP0.shape,
                )
                DinvAP0.data *= p_omega
                P = (P0 - DinvAP0).tocsr()
                ADinv = sp.csr_matrix(
                    (A.data * dinv[A.indices], A.indices, A.indptr),
                    shape=A.shape,
                )
                # A P = A P0 - w (A D^-1) (A P0): reuses A@P0 — one big
                # matmul instead of recomputing A@P from scratch below
                T = (ADinv @ AP0).tocsr()
                T.data *= p_omega
                AP = (AP0 - T).tocsr()
            else:
                P = P0
                AP = None
            # grid= enables the constant-stencil fast path (zero
            # coefficient traffic) on levels whose RAP stays exactly
            # constant-coefficient — L0 of the BASELINE Poisson configs
            # blk_dtype is threaded INTO construction so the streamed-panel
            # plan runs on the host array; re-planning a built operator
            # (.planned(blk_dtype=...)) fetches the device panel back
            # through the relay (~130 s per 8M level, profiled round 4 —
            # it was 80% of the 372 s 8M setup wall)
            blk = "auto" if coeff_dtype is None else coeff_dtype
            Ad = scipy_to_dia(
                A, max_offsets=max_offsets, dtype=dtype, grid=fine,
                transpose="symmetric" if sym else False, blk_dtype=blk,
            )
            Adt = (
                Ad
                if sym
                else scipy_to_dia(
                    A.T.tocsr(), max_offsets=max_offsets, dtype=dtype,
                    grid=fine, transpose=False, blk_dtype=blk,
                )
            )
            levels.append(
                GMGLevel(
                    A=Ad,
                    At=Adt,
                    inv_diag=jnp.asarray(dinv.astype(dtype)),
                    Es=_expansion_matrices(coarse, fine),
                    fine=fine,
                    coarse=coarse,
                    p_omega=p_omega,
                    smoothed=smoothed,
                )
            )
            # exact Galerkin: P^T (A P). Materializing P^T as CSR avoids
            # SciPy's repeated csc<->csr conversions inside the chained
            # product (csr_tocsc was ~12% of an 8M setup)
            Pt = P.T.tocsr()
            A = (Pt @ (AP if AP is not None else (A @ P).tocsr())).tocsr()
            A.eliminate_zeros()
            fine = coarse
        coarse_inv = np.linalg.inv(A.toarray())  # host, f64
        cheb_pre = cheb_post = ()
        if smoother == "chebyshev":
            cheb_pre = tuple(
                chebyshev_omegas(ub, nu_pre, cheb_alpha) for ub in cheb_ubs
            )
            cheb_post = tuple(
                chebyshev_omegas(ub, nu_post, cheb_alpha) for ub in cheb_ubs
            )
        return GMGPC(
            levels=tuple(levels),
            coarse_inv=jnp.asarray(coarse_inv.astype(dtype)),
            nu_pre=nu_pre,
            nu_post=nu_post,
            smooth_omega=smooth_omega,
            smoother=smoother,
            cheb_pre=cheb_pre,
            cheb_post=cheb_post,
        )


register_dataclass(
    GMGPC,
    data_fields=["levels", "coarse_inv"],
    meta_fields=["nu_pre", "nu_post", "smooth_omega", "smoother",
                 "cheb_pre", "cheb_post"],
)


def _make_ub_dev():
    import functools as _functools

    import jax as _jax

    @_functools.partial(_jax.jit, static_argnums=(1,))
    def _ub(D, i0):
        return jnp.max(
            jnp.where(
                D[i0] != 0,
                jnp.sum(jnp.abs(D), axis=0) / jnp.abs(D[i0]),
                0.0,
            )
        )

    return _ub


def _make_dinv_dev():
    import jax as _jax

    @_jax.jit
    def _dinv(dd):
        return jnp.where(dd != 0, 1.0 / jnp.where(dd != 0, dd, 1.0), 0.0)

    return _dinv


_UB_DEV = _make_ub_dev()
_DINV_DEV = _make_dinv_dev()


def _probe_setup(
    A, grid, sym, max_levels, coarse_size, nu_pre, nu_post,
    smooth_omega, p_omega, max_offsets, smooth_levels, dtype,
    coeff_dtype, smoother, cheb_alpha,
):
    """GMGPC.setup(rap="probe"): the same hierarchy, with every coarse
    operator computed ON DEVICE by exact Galerkin stencil probing
    (pc/rap_probe.py) instead of host scipy SpGEMM + panel upload.

    Level 0 comes from the host CSR exactly as in host mode; each deeper
    level's DIA data is probed through the previous GMGLevel's own
    prolong/matvec/restrict, pruned of structurally-zero diagonals (one
    tiny per-diagonal max fetch), and laid out for the streaming kernel
    on the device. Host work after level 0 is O(1) per level."""
    import os as _os
    import sys as _sys
    import time as _time

    import jax as _jax

    from kryst_tpu.pc.rap_probe import (
        build_coarse_operator, coarse_reach, dia_to_dense_host,
        per_axis_reach, probe_coarse_data, probe_deltas, probe_ok,
        prune_diagonals,
    )

    _trace = bool(_os.environ.get("KRYST_TPU_SETUP_TRACE"))
    _tprev = [_time.time()]

    def _t(msg):
        if _trace:
            now = _time.time()
            print(f"[probe-setup] {msg}: {now - _tprev[0]:.1f}s",
                  file=_sys.stderr, flush=True)
            _tprev[0] = now

    fine = tuple(grid)
    levels: List[GMGLevel] = []
    cheb_ubs: List[float] = []
    blk0 = "auto" if coeff_dtype is None else coeff_dtype
    blk = None if coeff_dtype is None else coeff_dtype

    # ---- level 0 operator: host CSR -> device, or a device-born
    # DIAOperator used as-is (zero host work / upload at L0)
    from kryst_tpu.ops.dia import DIAOperator as _DIA

    device_l0 = isinstance(A, _DIA)
    if device_l0:
        Ad = A
        dinv_dev = _DINV_DEV(Ad.data[Ad.offsets.index(0)])
        _t("L0 device diag")
    else:
        d0 = np.asarray(A.diagonal())
        dinv_host = np.where(d0 != 0, 1.0 / np.where(d0 != 0, d0, 1.0), 0.0)
        _t("L0 host diag")
        Ad = scipy_to_dia(
            A, max_offsets=max_offsets, dtype=dtype, grid=fine,
            transpose="symmetric" if sym else True, blk_dtype=blk0,
        )
        _t("L0 scipy_to_dia (+upload)")
        dinv_dev = jnp.asarray(dinv_host.astype(dtype))

    def _ub_host():
        if device_l0:
            return float(_UB_DEV(Ad.data, Ad.offsets.index(0)))
        rowsum = np.asarray(np.abs(A).sum(axis=1)).ravel()
        return float(
            np.max(
                np.where(d0 != 0, rowsum / np.maximum(np.abs(d0), 1e-300), 0.0)
            )
        )

    # module-level jits: fresh per-setup wrappers re-traced and
    # re-loaded every graph each call (~10 s/level client-side at 8M,
    # round-5 stage 9)
    from kryst_tpu.pc.rap_probe import probe_coarse_data_jit as _probe

    _ub_dev = _UB_DEV
    _dinv_dev = _DINV_DEV

    handoff = False  # grid got too small for alias-free probing
    for lvl_idx in range(max_levels):
        nn = int(np.prod(fine))
        if nn <= coarse_size or min(fine) <= 2:
            break
        coarse = tuple((f + 1) // 2 for f in fine)
        smoothed = lvl_idx < smooth_levels
        fr = per_axis_reach(Ad.offsets, fine)
        if fr is None:
            raise ValueError(
                "rap='probe' needs grid-local stencil offsets; "
                f"level {lvl_idx} offsets do not decompose over {fine}"
            )
        rc = coarse_reach(fr, smoothed)
        if not probe_ok(coarse, rc):
            handoff = True  # finish the (tiny) tail on the host path
            break
        if smoother == "chebyshev":
            if lvl_idx == 0:
                cheb_ubs.append(max(_ub_host(), 1e-12))
            else:
                i0 = Ad.offsets.index(0)
                cheb_ubs.append(max(float(_ub_dev(Ad.data, i0)), 1e-12))
        lvl = GMGLevel(
            A=Ad,
            At=(Ad if sym else Ad.at),
            inv_diag=dinv_dev,
            Es=_expansion_matrices(coarse, fine),
            fine=fine,
            coarse=coarse,
            p_omega=p_omega,
            smoothed=smoothed,
        )
        levels.append(lvl)
        nc = int(np.prod(coarse))
        datac, offs = prune_diagonals(
            _probe(lvl, rc, "A"), probe_deltas(rc), coarse
        )
        _t(f"L{lvl_idx} probe+prune ({len(offs)} diags)")
        datat = offst = None
        if not sym:
            datat, offst = prune_diagonals(
                _probe(lvl, rc, "At"), probe_deltas(rc), coarse
            )
            _t(f"L{lvl_idx} transpose probe+prune")
        if len(offs) > max_offsets:
            levels.pop()
            if smoother == "chebyshev":
                cheb_ubs.pop()
            handoff = True
            break
        Ad = build_coarse_operator(
            datac, offs, nc, sym, datat, offst, blk_dtype=blk
        )
        _t(f"L{lvl_idx} coarse op build (relayout)")
        dinv_dev = _dinv_dev(datac[offs.index(0)])
        fine = coarse

    if handoff and levels:
        # probing became infeasible (grid smaller than a color period /
        # offset blow-up) with n still above coarse_size. The remaining
        # levels are SMALL by definition — fetch the current operator
        # (tiny) and finish the identical hierarchy on the host path, so
        # probe-mode hierarchies are structurally equal to host-mode ones.
        from kryst_tpu.matrix.csr import CSRMatrix as _CSR

        from kryst_tpu.pc.rap_probe import dia_to_scipy_host

        a_tail = dia_to_scipy_host(
            np.asarray(_jax.device_get(Ad.data)), Ad.offsets,
            int(np.prod(fine)),
        )
        tail = GMGPC.setup(
            _CSR(
                a_tail.indptr, a_tail.indices, a_tail.data, a_tail.shape
            ),
            fine,
            max_levels=max_levels - len(levels),
            coarse_size=coarse_size,
            nu_pre=nu_pre,
            nu_post=nu_post,
            smooth_omega=smooth_omega,
            p_omega=p_omega,
            max_offsets=max_offsets,
            smooth_levels=max(0, smooth_levels - len(levels)),
            dtype=dtype,
            coeff_dtype=coeff_dtype,
            smoother=smoother,
            cheb_alpha=cheb_alpha,
            symmetric=sym,
            rap="host",
        )
        return GMGPC(
            levels=tuple(levels) + tail.levels,
            coarse_inv=tail.coarse_inv,
            nu_pre=nu_pre,
            nu_post=nu_post,
            smooth_omega=smooth_omega,
            smoother=smoother,
            cheb_pre=tuple(
                chebyshev_omegas(ub, nu_pre, cheb_alpha) for ub in cheb_ubs
            ) + tail.cheb_pre,
            cheb_post=tuple(
                chebyshev_omegas(ub, nu_post, cheb_alpha) for ub in cheb_ubs
            ) + tail.cheb_post,
        )

    if levels:
        n_bot = int(np.prod(fine))  # bottom operator is Ad (last probed)
        dense = dia_to_dense_host(
            np.asarray(_jax.device_get(Ad.data)), Ad.offsets, n_bot
        )
        coarse_inv = np.linalg.inv(dense)
        _t("bottom fetch + dense inverse")
    elif device_l0:
        # tiny grid, no probed levels: fetch the (small) device panel once
        coarse_inv = np.linalg.inv(
            dia_to_dense_host(
                np.asarray(_jax.device_get(A.data)), A.offsets, A.n
            )
        )
    else:
        coarse_inv = np.linalg.inv(A.toarray())
    cheb_pre = cheb_post = ()
    if smoother == "chebyshev":
        cheb_pre = tuple(
            chebyshev_omegas(ub, nu_pre, cheb_alpha) for ub in cheb_ubs
        )
        cheb_post = tuple(
            chebyshev_omegas(ub, nu_post, cheb_alpha) for ub in cheb_ubs
        )
    return GMGPC(
        levels=tuple(levels),
        coarse_inv=jnp.asarray(coarse_inv.astype(dtype)),
        nu_pre=nu_pre,
        nu_post=nu_post,
        smooth_omega=smooth_omega,
        smoother=smoother,
        cheb_pre=cheb_pre,
        cheb_post=cheb_post,
    )
