"""DIA (sparse-diagonal) operator with a gather-free Pallas TPU kernel.

Why this format: XLA lowers arbitrary gathers to a ~7.5 ns/element serial
loop on TPU (measured on v5e — 2 GB/s effective, 400x off the HBM
roofline), so the classic CSR/ELL gather SpMV cannot be the hot-path
format. A matrix stored by sparse diagonals needs NO gather at all:

    y[i] = sum_d data[d, i] * x[i + off_d]

Every term is a statically-offset contiguous vector load — pure VPU work.
The Pallas kernel keeps the (padded) x vector resident in VMEM and walks
the offsets in an unrolled loop per output block, so the whole SpMV is one
kernel launch at HBM-bandwidth cost. This covers stencil matrices exactly
(Poisson 5/7-point, convection-diffusion) and any reordered matrix with a
bounded set of distinct diagonal offsets (structured-aggregation multigrid
hierarchies, banded FEM after RCM).

Convention: ``data[d, i] = A[i, i + offsets[d]]`` (row-major diagonal
storage); out-of-range entries are zero.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax
from jax.tree_util import register_dataclass

from kryst_tpu.matrix.csr import CSRMatrix


def _on_cpu() -> bool:
    return jax.default_backend() == "cpu"


@dataclasses.dataclass(frozen=True)
class DIAOperator:
    """Square sparse-diagonal operator.

    ``data_blk``/``plan`` (optional) hold the pre-blocked coefficient
    layout for the beyond-VMEM streaming kernel (ops/streamed.py) —
    computed ONCE at construction by :func:`csr_to_dia`/:func:`scipy_to_dia`
    for large matrices, because doing the re-layout inside a jitted matvec
    is not hoisted out of solver while_loops and caps the kernel at ~155
    GB/s vs 769 GB/s (measured at 8M dof).
    """

    data: Array  # (ndiag, n)
    offsets: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    data_blk: object = None  # Optional[Array], blocked-flat layout
    plan: object = dataclasses.field(default=None, metadata=dict(static=True))
    # Transpose support (advisor round 2: rmatvec rebuilt A^T diagonals
    # in-jit on every call and always took the XLA path — the ~79 GB/s
    # cliff for beyond-VMEM qmr/cgnr/cgne). ``symmetric`` (detected at
    # construction) makes rmatvec = matvec for free; ``at`` is an optional
    # pre-planned transposed operator for nonsymmetric streaming.
    at: object = None  # Optional["DIAOperator"]
    symmetric: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    # Constant-stencil fast path (ops/conststencil.py): when every diagonal
    # is EXACTLY a constant masked by the grid boundary (detected at
    # construction from an explicit ``grid=``), the streamed matvec needs
    # NO coefficient traffic at all — 3x at 8M dof (measured). ``cs_coeffs``
    # is the (ndiag,) constant vector; ``cs_deltas`` the per-offset axis
    # decomposition; ``cs_grid`` the row-major grid shape.
    cs_coeffs: object = None  # Optional[Array] (ndiag,)
    cs_deltas: object = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    cs_grid: object = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    # whether the Pallas const kernel's lane geometry holds (masked inner
    # axes >= 128); the XLA form is usable regardless of this flag
    cs_pallas: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    # Flat (ndiag*n,) copy of ``data`` for the XLA shifted-slice paths.
    # Why (round-5 root cause of the "8x PCG regression", VERDICT r4):
    # when the operator crosses a jit boundary as an ARGUMENT, the 2-D
    # (ndiag, n) panel parameter gets an 8-sublane tiled layout
    # T(8,128), and slicing one diagonal row out of it reads 8x its
    # bytes — 192 vs 24 us/iter on the 1M PCG+Jacobi loop (measured,
    # tools/tpu_r5_stage{1..5}.py). A 1-D parameter keeps a dense
    # T(1024) layout; its per-diagonal slices fuse as views and the
    # loop runs at the closure-form (HLO-constant) speed. Populated at
    # construction whenever the XLA form is the primary matvec path.
    data_flat: object = None  # Optional[Array] (ndiag*n,)
    # Hoisted per-diagonal row views (tuple of (n,) arrays), produced by
    # :meth:`prepare` at TRACE TIME just before a solver's while_loop:
    # slicing ``data_flat`` inside the loop body still costs ~2x
    # (39-47 us/iter vs 15-24 hoisted, tools/tpu_r5_stage{4,5}.py)
    # because the slices re-materialize per iteration; slices traced
    # OUTSIDE the loop are computed once and ride the carry as
    # invariants. Never populated at construction — solver-local.
    data_rows: object = None  # Optional[Tuple[Array, ...]]

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.data.dtype

    def planned(self, block_rows: int = 0, blk_dtype=None) -> "DIAOperator":
        """Return a copy carrying the streaming-kernel layout.

        Call OUTSIDE jit (host-side data). No-op if already planned with
        the requested precision AND block size; ``blk_dtype=None`` means
        the data's own dtype, so a bf16-planned operator can be re-planned
        back to full precision. ``blk_dtype`` (e.g. ``jnp.bfloat16``)
        stores the streamed coefficient panels in lower precision —
        halves the dominant HBM stream; use only where an approximate
        operator is acceptable (PC internals, refined inner solves)."""
        target = jnp.dtype(blk_dtype) if blk_dtype is not None else self.data.dtype
        br = 0
        if block_rows:
            # mirror _plan_geometry/plan_dia rounding so a repeated call
            # with the same raw block_rows is a no-op
            br = -(-block_rows // 8) * 8
            if target.itemsize < 4:
                br = -(-br // 16) * 16
        if (
            self.data_blk is not None
            and self.data_blk.dtype == target
            and (br == 0 or self.plan.block_rows == br)
        ):
            return self
        from kryst_tpu.ops.streamed import plan_dia

        dblk, plan = plan_dia(
            np.asarray(self.data), self.offsets, block_rows, blk_dtype=blk_dtype
        )
        return DIAOperator(
            self.data, self.offsets, self.n, jnp.asarray(dblk), plan,
            self.at, self.symmetric,
            self.cs_coeffs, self.cs_deltas, self.cs_grid, self.cs_pallas,
            data_flat=self.data_flat,
        )

    def _resident(self) -> bool:
        """Whole working set (coeffs + a few vectors) fits VMEM (128 MB on
        v5e, measured): XLA keeps it resident across while_loop iterations
        and runs the shifted-slice form at VMEM speed (~2 TB/s effective at
        1M dof, measured) — any pallas_call here would force an HBM
        round-trip and LOSE (44 us vs 17 us per SpMV at 1M dof, measured)."""
        ws = (len(self.offsets) + 3) * self.n * self.data.dtype.itemsize
        return ws <= 96 * 1024 * 1024

    def _xla_rows(self):
        """Per-diagonal coefficient rows for the XLA shifted-slice paths.

        Returns the hoisted row views when :meth:`prepare` ran, else
        dense 1-D slices of ``data_flat`` when present (see the field
        comment: a 2-D panel ARGUMENT is sublane-tiled and row slices
        read 8x their bytes), else the 2-D panel — all index as
        ``rows[k]`` so every XLA-form kernel takes any of them."""
        if self.data_rows is not None:
            return self.data_rows
        if self.data_flat is not None:
            n = self.n
            return tuple(
                lax.slice(self.data_flat, (k * n,), ((k + 1) * n,))
                for k in range(len(self.offsets))
            )
        return self.data

    def prepare(self) -> "DIAOperator":
        """Hoist the per-diagonal row views out of the caller's loop.

        Solvers call this ONCE at entry (trace time, before their
        while_loop) so every in-loop matvec reuses the same slices —
        the difference between 15-24 and 39-47 us/iter on the 1M PCG
        loop (tools/tpu_r5_stage{4,5}.py). Idempotent; a no-op for
        operators without ``data_flat``."""
        if self.data_flat is None or self.data_rows is not None:
            return self
        return dataclasses.replace(self, data_rows=self._xla_rows())

    def matvec(self, x: Array) -> Array:
        # All paths are gather-free. Policy (measured on v5e):
        # - resident working set, few offsets: XLA shifted slices (VMEM
        #   speed; ~5 HLO ops per diagonal is fine at <= 8 offsets)
        # - resident, many offsets: rolled Pallas kernel (the XLA form's
        #   O(ndiag) HLO blew up compile time at 125-diagonal AMG levels)
        # - beyond VMEM: streaming Pallas kernel (the XLA form craters to
        #   ~79 GB/s at 8M dof; streaming a pre-planned contiguous layout
        #   holds the measured HBM roofline)
        if _on_cpu() or self.data.dtype.itemsize >= 8:
            # f64 is EMULATED on TPU and XLA's x64-rewrite pass cannot
            # process custom_calls — f64 Pallas kernels are impossible
            # (measured: 'rewriting not implemented: pallas_call f64').
            if self.cs_deltas is not None:
                # constant stencil: n-D shifted slices, zero coefficient
                # reads — the f64 refinement outer pass at 8M dof would
                # otherwise stream 450 MB of f64 panels per residual
                from kryst_tpu.ops.conststencil import const_spmv_xla

                return const_spmv_xla(
                    self.cs_coeffs, self.cs_deltas, self.cs_grid, x
                )
            return dia_spmv_xla(self._xla_rows(), self.offsets, x)
        if self._resident() and len(self.offsets) <= 8:
            return dia_spmv_xla(self._xla_rows(), self.offsets, x)
        from kryst_tpu.ops.streamed import dia_spmv_planned, dia_spmv_streamed

        if self.data_blk is not None:
            # planned streaming also wins at RESIDENT sizes once the
            # offset count is large: the rolled whole-vector kernel pays
            # HBM boundaries per offset-group launch (L2 of the 8M GMG
            # hierarchy, 179 diagonals: 417 us rolled vs ~130 us streamed)
            # — and it BEATS the const-stencil Pallas kernel at 8M dof
            # (344.5 vs 377.2 us measured round 3: the const kernel's
            # per-element mask/coordinate VPU work outweighs the saved
            # coefficient stream), so planned layout is preferred even
            # for constant stencils.
            return dia_spmv_planned(self.data_blk, self.offsets, x, self.plan)
        if self.cs_pallas:
            # constant-stencil kernel: zero coefficient traffic; used only
            # when no planned layout was built (saves the 2x coefficient
            # memory; ~10% slower than planned streaming, measured)
            from kryst_tpu.ops.conststencil import const_spmv

            return const_spmv(
                self.cs_coeffs, self.offsets, self.cs_deltas, self.cs_grid, x
            )
        if self._resident():
            return dia_spmv_rolled(self.data, self.offsets, x)
        return dia_spmv_streamed(self.data, self.offsets, x)

    def matvec_block(self, X: Array) -> Array:
        """A @ X for X of shape (n, r).

        Resident sizes use the shifted-slice XLA block form: one pass
        over the coefficient planes for ALL r columns at VMEM speed (a
        per-column matvec reads them r times). Beyond VMEM, planned
        operators run the multi-vector streamed kernel
        (ops/streamed.py::dia_spmv_planned_block): X is tiled with halo
        margins per chunk and each coefficient panel streams ONCE for
        all r columns — removing the r-fold panel re-read of a
        per-column loop (ROADMAP 0b; measured 1.50x over per-column at
        8M k=8 through this (n, r) entry — the remaining gap to the
        traffic bound is the two strided layout transposes this entry
        pays, which ``matvec_cols`` avoids). Const-stencil operators
        also prefer the planned block kernel (round-3 measurement: the
        const Pallas kernel is VPU-bound, not traffic-bound); the
        per-column const loop is only the no-plan fallback.
        """
        if self.cs_deltas is not None and (
            _on_cpu() or self.data.dtype.itemsize >= 8
        ):
            from kryst_tpu.ops.conststencil import const_spmv_xla
            import jax as _jax

            return _jax.vmap(
                lambda col: const_spmv_xla(
                    self.cs_coeffs, self.cs_deltas, self.cs_grid, col
                ),
                in_axes=1, out_axes=1,
            )(X)
        if not _on_cpu() and self.data.dtype.itemsize < 8:
            if self.data_blk is not None:
                from kryst_tpu.ops.streamed import dia_spmv_planned_block

                return dia_spmv_planned_block(
                    self.data_blk, self.offsets, X, self.plan
                )
            if self.cs_pallas:
                return jnp.stack(
                    [self.matvec(X[:, j]) for j in range(X.shape[1])], axis=1
                )
        return dia_spmv_xla_block(self._xla_rows(), self.offsets, X)

    def matvec_cols(self, Xk: Array) -> Array:
        """A @ X with X supplied as (k, n) ROWS-of-columns, returning (k, n).

        The block solvers' internal layout: each RHS/basis vector is a
        CONTIGUOUS row, so the beyond-VMEM streaming kernel ingests it
        with a pure reshape — the (n, k) ``matvec_block`` entry point
        pays two strided layout transposes (measured ~4.5x the kernel
        cost at 8M k=8, round 3) that this path never materializes.
        """
        if self.cs_deltas is not None and (
            _on_cpu() or self.data.dtype.itemsize >= 8
        ):
            from kryst_tpu.ops.conststencil import const_spmv_xla
            import jax as _jax

            return _jax.vmap(
                lambda col: const_spmv_xla(
                    self.cs_coeffs, self.cs_deltas, self.cs_grid, col
                )
            )(Xk)
        if (
            not _on_cpu()
            and self.data.dtype.itemsize < 8
            and self.data_blk is not None
            and not self._resident()
        ):
            from kryst_tpu.ops.streamed import dia_spmv_planned_cols

            return dia_spmv_planned_cols(
                self.data_blk, self.offsets, Xk, self.plan
            )
        return dia_spmv_xla_cols(self._xla_rows(), self.offsets, Xk)

    def inter_ok(self, k: int = 1) -> bool:
        """Whether the block-interleaved carrier path applies: a planned
        beyond-VMEM operator whose halo fits one neighbor block
        (margin <= block_rows). Block solvers switch their multivector
        carrier to the interleaved layout when this holds — the (k, n)
        streamed path pays ~5 ms of XLA copies + serialized output DMAs
        per matvec at 8M k=8 (tools/tpu_r4_stage4.py) that the carrier
        avoids entirely."""
        return (
            not _on_cpu()
            and self.data.dtype.itemsize < 8
            and self.data_blk is not None
            and not self._resident()
            and self.plan.margin <= self.plan.block_rows
        )

    def matvec_inter(self, Xi: Array, k: int, with_gram: bool = False):
        """A @ X on the block-interleaved carrier (ops/streamed.py::
        interleave_cols layout). Only valid when :meth:`inter_ok` (or,
        for tests, on CPU where the kernel runs in interpret mode).
        ``with_gram=True`` returns ``(Yi, X^T A X)`` from the same pass
        (block PCG's T = P^T Q at zero extra HBM traffic)."""
        from kryst_tpu.ops.streamed import dia_spmv_planned_inter

        return dia_spmv_planned_inter(
            self.data_blk, self.offsets, Xi, self.plan, k,
            with_gram=with_gram, interpret=_on_cpu(),
        )

    def rmatvec(self, x: Array) -> Array:
        if self.symmetric:
            return self.matvec(x)  # A^T = A: full streaming path for free
        if self.at is not None:
            # pre-planned transpose (built at construction for beyond-VMEM
            # nonsymmetric operators): streaming path instead of the in-jit
            # re-layout + XLA cliff below
            return self.at.matvec(x)
        # Fallback (resident-size operators): build A^T diagonals in-jit.
        # A^T in DIA: diagonal d of A^T at offset -d, shifted by d:
        # A^T[i, i-d] = A[i-d, i] = data[d, i-d]
        n = self.n
        rows = self._xla_rows()
        data_t = []
        for k, off in enumerate(self.offsets):
            row = rows[k]
            if off >= 0:
                shifted = jnp.concatenate([jnp.zeros(off, row.dtype), row[: n - off]])
            else:
                shifted = jnp.concatenate([row[-off:], jnp.zeros(-off, row.dtype)])
            data_t.append(shifted)
        # keep the per-diagonal 1-D forms (tuple) — stacking to 2-D here
        # would materialize a tiled panel inside jit for nothing
        offs_t = tuple(-o for o in self.offsets)
        return dia_spmv_xla(tuple(data_t), offs_t, x)

    def matvec_dot(self, p: Array):
        """(A p, <p, A p>) — the capability hook the CG solvers probe for.

        At resident sizes the dot simply rides the XLA fusion of matvec
        (measured: a separate fused Pallas kernel is SLOWER because the
        pallas_call boundary evicts the VMEM-resident state). Beyond VMEM
        the chunked streaming kernel folds the dot into its output pass."""
        if (
            not _on_cpu()
            and not self._resident()
            and self.data.dtype.itemsize < 8  # no f64 pallas on TPU
        ):
            from kryst_tpu.ops.streamed import dia_spmv_planned, dia_spmv_streamed

            if self.data_blk is not None:
                return dia_spmv_planned(
                    self.data_blk, self.offsets, p, self.plan, with_dot=True
                )
            if self.cs_pallas:
                from kryst_tpu.ops.conststencil import const_spmv

                return const_spmv(
                    self.cs_coeffs, self.offsets, self.cs_deltas,
                    self.cs_grid, p, with_dot=True,
                )
            return dia_spmv_streamed(self.data, self.offsets, p, with_dot=True)
        y = self.matvec(p)
        return y, jnp.sum(p * y)

    def matvec_shift(self, u: Array, u_prev: Array, re, imsq, inv_gamma):
        """Fused CA-GMRES Newton-basis step:
        ``w = (A u - re*u + imsq*u_prev) * inv_gamma`` and ``sum(w*w)``.

        On the beyond-VMEM planned path this is ONE kernel pass (the
        shift epilogue + norm accumulate ride the SpMV stream — the
        separate XLA pass reads A u + u + u_prev and writes w, ~128 MB
        per basis step at 8M dof). Everywhere else it is the plain XLA
        form, where the elementwise chain fuses anyway. The scalars may
        be traced device values."""
        if (
            not _on_cpu()
            and not self._resident()
            and self.data.dtype.itemsize < 8
            and self.data_blk is not None
        ):
            from kryst_tpu.ops.streamed import dia_spmv_planned

            sc = jnp.stack([
                jnp.asarray(re, u.dtype),
                jnp.asarray(imsq, u.dtype),
                jnp.asarray(inv_gamma, u.dtype),
            ]).reshape(1, 3)
            return dia_spmv_planned(
                self.data_blk, self.offsets, u, self.plan,
                with_dot=True, shift_prev=u_prev, shift_scalars=sc,
            )
        w = (self.matvec(u) - re * u + imsq * u_prev) * inv_gamma
        return w, jnp.sum(w * w)

    def smooth_jacobi(self, z: Array, r: Array, dinv: Array, omega) -> Array:
        """One damped-Jacobi step z + omega*dinv*(r - A z), fused into the
        streaming kernel's epilogue on the beyond-VMEM path (one HBM pass
        instead of SpMV + separate elementwise pass — the pallas_call
        boundary prevents XLA from fusing them). Exact same arithmetic as
        the unfused form."""
        if (
            not _on_cpu()
            and self.data.dtype.itemsize < 8
            and (not self._resident() or len(self.offsets) > 8)
        ):
            if self.data_blk is not None:
                from kryst_tpu.ops.streamed import dia_spmv_planned

                return dia_spmv_planned(
                    self.data_blk, self.offsets, z, self.plan,
                    smooth_r=r, smooth_dinv=dinv, smooth_omega=float(omega),
                )
            if self.cs_pallas:
                from kryst_tpu.ops.conststencil import const_spmv

                return const_spmv(
                    self.cs_coeffs, self.offsets, self.cs_deltas,
                    self.cs_grid, z, smooth_z=z, smooth_r=r,
                    smooth_dinv=dinv, smooth_omega=float(omega),
                )
        return z + omega * dinv * (r - self.matvec(z))

    def diagonal(self) -> Array:
        if 0 in self.offsets:
            return self._xla_rows()[self.offsets.index(0)]
        return jnp.zeros(self.n, dtype=self.data.dtype)

    def todense(self) -> Array:
        out = jnp.zeros((self.n, self.n), dtype=self.data.dtype)
        idx = jnp.arange(self.n)
        for k, off in enumerate(self.offsets):
            valid = (idx + off >= 0) & (idx + off < self.n)
            rows = jnp.where(valid, idx, 0)
            cols = jnp.where(valid, idx + off, 0)
            out = out.at[rows, cols].add(jnp.where(valid, self.data[k], 0.0))
        return out


register_dataclass(
    DIAOperator,
    data_fields=["data", "data_blk", "at", "cs_coeffs", "data_flat",
                 "data_rows"],
    meta_fields=["offsets", "n", "plan", "symmetric", "cs_deltas", "cs_grid",
                 "cs_pallas"],
)


def dia_transpose_host(
    data: np.ndarray, offsets: Tuple[int, ...], n: int
) -> Tuple[np.ndarray, Tuple[int, ...]]:
    """Host-side transposed diagonals (ascending-offset order).

    A^T's diagonal at offset ``ot`` is A's diagonal at ``-ot`` shifted:
    ``At[j, i] = A[i+ot, i] = data[k, i+ot]`` where ``offsets[k] == -ot``.
    """
    offs_t = tuple(sorted(-o for o in offsets))
    idx = {int(o): k for k, o in enumerate(offsets)}
    out = np.zeros_like(data)
    for j, ot in enumerate(offs_t):
        k = idx[-ot]
        if ot >= 0:
            out[j, : n - ot] = data[k, ot:n]
        else:
            out[j, -ot:n] = data[k, : n + ot]
    return out, offs_t


def dia_spmv_xla(data: Array, offsets: Tuple[int, ...], x: Array) -> Array:
    """Reference path: ONE zero-padded buffer + static slices (runs
    anywhere).

    History: the first form built each diagonal's contribution as
    ``concatenate([seg, zeros])`` — XLA materializes those concatenates
    instead of fusing them, and the 7-offset 1M-dof matvec measured
    300 us (~120 GB/s) inside compiled loops (tools/tpu_r4_stage10.py).
    Slicing a single shared padded buffer keeps every term a VIEW, so the
    whole sum is one elementwise fusion: read xp + panels once, write y
    once. Results are identical: out-of-range slots hit the zero padding
    exactly where the concat form pinned explicit zeros, and the
    accumulation order over ``offsets`` is unchanged.
    """
    n = x.shape[0]
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    xp = jnp.pad(x, (lo, hi)) if lo or hi else x
    acc = None
    for k, off in enumerate(offsets):
        w = lax.slice_in_dim(xp, lo + off, lo + off + n)
        term = data[k] * w
        acc = term if acc is None else acc + term
    return acc


def dia_spmv_xla_block(data: Array, offsets: Tuple[int, ...], X: Array) -> Array:
    """A @ X for a block of column vectors X (n, r) — the shifted-slice
    form with the shift on the row axis and the coefficient plane
    broadcast over columns.

    The point on TPU: each coefficient plane is read ONCE for all r
    right-hand sides (a vmapped per-column matvec re-streams the
    coefficients r times), so beyond VMEM the per-RHS coefficient
    traffic drops by r — the dominant term for multi-diagonal operators.
    """
    n = X.shape[0]
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    Xp = jnp.pad(X, ((lo, hi), (0, 0))) if lo or hi else X
    acc = None
    for k, off in enumerate(offsets):
        W = lax.slice_in_dim(Xp, lo + off, lo + off + n, axis=0)
        term = data[k][:, None] * W
        acc = term if acc is None else acc + term
    return acc


def dia_spmv_xla_cols(data: Array, offsets: Tuple[int, ...], Xk: Array) -> Array:
    """A @ X for X as (k, n) rows-of-columns — shifted slices on the LAST
    axis (contiguous per RHS), coefficient plane read once for all rows.
    The resident-size twin of the streamed cols kernel."""
    n = Xk.shape[1]
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    Xp = jnp.pad(Xk, ((0, 0), (lo, hi))) if lo or hi else Xk
    acc = None
    for k, off in enumerate(offsets):
        W = lax.slice_in_dim(Xp, lo + off, lo + off + n, axis=1)
        term = data[k][None, :] * W
        acc = term if acc is None else acc + term
    return acc


def _dia_rolled_kernel(offsets, m, x_ref, d_ref, o_ref):
    """Whole-vector DIA SpMV via in-register rolls (no gathers, no
    alignment-sensitive loads).

    x is viewed as (m, 128). A flat shift by ``off = q*128 + r`` is a
    sublane roll by -q plus, for r != 0, a lane roll by -r with a
    one-row carry fix on the wrapped lanes. Wrap-around values are
    harmless: DIA coefficients are zero wherever i+off is out of range.
    """
    import jax.lax as lax_
    from jax.experimental.pallas import tpu as pltpu

    X = x_ref[...]
    lane = lax_.broadcasted_iota(jnp.int32, (m, 128), 1)
    acc = None
    for k, off in enumerate(offsets):
        q, r = divmod(off, 128)
        # pltpu.roll takes non-negative shifts; rolls are circular so
        # a shift of -s is (axis_len - s) % axis_len
        Y = pltpu.roll(X, jnp.int32((-q) % m), axis=0) if q % m else X
        if r:
            Y1 = pltpu.roll(Y, jnp.int32((-r) % 128), axis=1)
            Y2 = pltpu.roll(Y1, jnp.int32(m - 1), axis=0)
            Y = jnp.where(lane < 128 - r, Y1, Y2)
        term = d_ref[k] * Y
        acc = term if acc is None else acc + term
    o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "group"))
def dia_spmv_rolled(data: Array, offsets: Tuple[int, ...], x: Array, group: int = 16):
    """DIA SpMV as a handful of Pallas launches (one per offset group that
    fits VMEM together with x). HLO size is O(#groups), not O(ndiag) — the
    XLA shifted-slice path emits ~5 ops per diagonal, which at 125-diagonal
    multigrid coarse operators exploded compile times."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    m = -(-n // 128)
    m = -(-m // 8) * 8  # sublane-tile friendly
    npad = m * 128
    # VMEM budget: x + group coefficient planes + out. Even one group needs
    # 3 planes resident; beyond that (e.g. 8M-dof vectors) use the XLA path.
    vmem_f32 = 3_300_000
    if npad > vmem_f32 // 3:  # 3 planes resident; ~1.1M f32 max (fits 1M dof)
        return dia_spmv_xla(data, offsets, x)
    X = jnp.pad(x, (0, npad - n)).reshape(m, 128)
    D = jnp.pad(data, ((0, 0), (0, npad - n))).reshape(len(offsets), m, 128)
    grp = max(1, min(group, (vmem_f32 - 2 * npad) // npad))
    out = None
    # explicit whole-array index maps returning np.int32 zeros: under
    # jax_enable_x64 the DEFAULT index map emits i64 zeros and Mosaic
    # rejects the kernel (failed to legalize func.return (i64, i64))
    z = np.int32(0)
    for g0 in range(0, len(offsets), grp):
        offs_g = offsets[g0 : g0 + grp]
        kern = functools.partial(_dia_rolled_kernel, offs_g, m)
        y = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((m, 128), lambda i: (z, z), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (len(offs_g), m, 128),
                    lambda i: (z, z, z),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (m, 128), lambda i: (z, z), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((m, 128), x.dtype),
        )(X, D[g0 : g0 + grp])
        out = y if out is None else out + y
    return out.reshape(npad)[:n]


def csr_to_dia(
    a: CSRMatrix, max_offsets: int = 512, dtype=None, transpose="auto",
    grid=None, blk_dtype="auto",
) -> DIAOperator:
    """Convert host CSR to DIA. Raises if the matrix has more than
    ``max_offsets`` distinct diagonals (DIA would waste too much memory)."""
    import scipy.sparse as sp

    dtype = dtype or a.data.dtype
    n = a.shape[0]
    from kryst_tpu import native

    nat = native.csr_to_dia_fill(a.indptr, a.indices, a.data, n, max_offsets, dtype)
    if isinstance(nat, tuple) and nat[0] is None:
        raise ValueError(
            f"matrix has {nat[1]} distinct diagonals (> {max_offsets}); "
            "DIA is not a sensible format — use ELL or reorder first"
        )
    if nat is not None:
        offs_n, data_n = nat
        return _make_dia(
            data_n, tuple(int(o) for o in offs_n), n, transpose=transpose,
            grid=grid, blk_dtype=blk_dtype,
        )
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(a.indptr))
    d = a.indices - rows
    offs = np.unique(d)
    if len(offs) > max_offsets:
        raise ValueError(
            f"matrix has {len(offs)} distinct diagonals (> {max_offsets}); "
            "DIA is not a sensible format — use ELL or reorder first"
        )
    data = np.zeros((len(offs), n), dtype=dtype)
    krow = np.searchsorted(offs, d)
    # duplicate (row, col) pairs need the (slow) np.add.at; a canonical
    # CSR (strictly increasing columns within each row) takes the ~10x
    # faster direct fancy assignment
    same_row = rows[1:] == rows[:-1]
    canonical = not np.any(same_row & (np.diff(a.indices) <= 0))
    if canonical:
        data[krow, rows] = a.data.astype(dtype)
    else:
        np.add.at(data, (krow, rows), a.data.astype(dtype))
    return _make_dia(
        data, tuple(int(o) for o in offs), n, transpose=transpose, grid=grid,
        blk_dtype=blk_dtype,
    )


def scipy_to_dia(
    A, max_offsets: int = 512, dtype=np.float32, transpose="auto", grid=None,
    blk_dtype="auto",
) -> DIAOperator:
    """scipy.sparse -> DIAOperator (row-major diagonal convention)."""
    import scipy.sparse as sp

    C = A.tocsr()
    if not C.has_canonical_format:
        # copy first: tocsr() returns the SAME object for CSR input and
        # sum_duplicates would re-sort the caller's matrix in place
        C = C.copy()
        C.sum_duplicates()
    n = C.shape[0]
    from kryst_tpu import native

    nat = native.csr_to_dia_fill(C.indptr, C.indices, C.data, n, max_offsets, dtype)
    if isinstance(nat, tuple) and nat[0] is None:
        raise ValueError(f"{nat[1]} distinct diagonals > {max_offsets}")
    if nat is not None:
        offs_n, data_n = nat
        return _make_dia(
            data_n, tuple(int(o) for o in offs_n), n, transpose=transpose,
            grid=grid, blk_dtype=blk_dtype,
        )
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(C.indptr))
    d = C.indices.astype(np.int64) - rows
    offs = np.unique(d)
    if len(offs) > max_offsets:
        raise ValueError(f"{len(offs)} distinct diagonals > {max_offsets}")
    data = np.zeros((len(offs), n), dtype=dtype)
    # canonical CSR has unique (row, col) pairs -> direct assignment
    # (np.add.at plus a per-element Python dict lookup cost ~7 s/level
    # at 1M dof in the GMG setup profile; a COO sum_duplicates lexsort
    # costs ~9 s/level)
    data[np.searchsorted(offs, d), rows] = C.data.astype(dtype)
    return _make_dia(
        data, tuple(int(o) for o in offs), n, transpose=transpose, grid=grid,
        blk_dtype=blk_dtype,
    )


def _make_dia(
    data: np.ndarray, offsets, n: int, transpose="auto", grid=None,
    blk_dtype="auto",
) -> DIAOperator:
    """Build the operator; attach the streaming-kernel layout eagerly when
    the working set is beyond the VMEM-residency threshold (the streaming
    path is the hot path there, and the layout must be built outside jit).

    ``transpose``: "auto" detects symmetry (rmatvec = matvec, zero cost)
    and, for NONSYMMETRIC operators on the streaming path, attaches a
    pre-planned transposed operator so rmatvec (qmr/cgnr/cgne) also runs
    at the roofline instead of the in-jit re-layout + XLA cliff. ``False``
    skips both (saves the transient host copy); ``True`` forces the
    transposed operator even at resident sizes; ``"symmetric"`` asserts
    the caller KNOWS the matrix is symmetric (e.g. Galerkin RAP of a
    symmetric input) and skips the O(nnz) detection pass entirely.

    ``blk_dtype``: precision of the STREAMED coefficient panels.
    ``"auto"`` (default) picks bf16 only when bitwise-exact (see below);
    an explicit dtype (e.g. ``jnp.bfloat16``) forces it. Pass it HERE —
    calling ``.planned(blk_dtype=...)`` on a built operator re-fetches
    the device panel through the relay (~130 s per 8M-dof level on this
    backend, profiled: 80% of the 8M GMG setup wall)."""
    offsets = tuple(int(o) for o in offsets)
    op = DIAOperator(jnp.asarray(data), offsets, n)
    streaming = (not op._resident() or len(offsets) > 8) and data.dtype.itemsize < 8
    # Whenever the XLA shifted-slice form is the primary matvec (all
    # non-streaming dispatches), also upload the panel FLAT: a 2-D panel
    # crossing a jit boundary as an argument is sublane-tiled and row
    # slices read 8x their bytes (the round-5 "PCG regression" — see the
    # data_flat field comment). Capped so a huge f64 panel does not
    # double its HBM footprint for a path that craters anyway.
    flat = None
    if not streaming and data.nbytes <= (512 << 20):
        flat = jnp.asarray(np.asarray(data).reshape(-1))
    symmetric = transpose == "symmetric"
    at = None
    if transpose == "auto" or transpose is True:
        data_t, offs_t = dia_transpose_host(np.asarray(data), offsets, n)
        symmetric = offs_t == offsets and np.array_equal(data_t, np.asarray(data))
        if not symmetric and (streaming or transpose is True):
            at = _make_dia(
                data_t, offs_t, n, transpose=False, grid=grid,
                blk_dtype=blk_dtype,
            )
    cs_coeffs = cs_deltas = cs_grid = None
    cs_pallas = False
    # detect for EVERY dtype: f32 beyond-VMEM uses the Pallas kernel
    # (when the lane geometry allows), f64/CPU use the shifted-slice XLA
    # form (const_spmv_xla) regardless
    if grid is not None:
        from kryst_tpu.ops.conststencil import detect_stencil

        det = detect_stencil(np.asarray(data), offsets, tuple(grid))
        if det is not None:
            cs_coeffs = jnp.asarray(det[0])
            cs_deltas = det[1]
            cs_grid = tuple(int(g) for g in grid)
            cs_pallas = bool(det[2])
    if streaming:
        # (f64 never uses the streamed kernel -- see matvec -- so don't
        # spend 2x memory on a layout it can't use). Constant-stencil
        # operators ALSO get the planned layout: the planned streaming
        # kernel measured FASTER than the const-stencil Pallas kernel at
        # 8M dof (344.5 vs 377.2 us, round 3 — the const kernel is
        # VPU-bound on mask/coordinate work, not bandwidth-bound), so
        # the 2x coefficient memory buys ~10% and a 1.5x block matvec.
        from kryst_tpu.ops.streamed import plan_dia

        # Free 1.75x: when every coefficient is EXACTLY representable in
        # bf16 (dyadic rationals with <= 8 mantissa bits — the Poisson
        # stencils, most Galerkin RAP levels of them), store the streamed
        # panels in bf16. The kernel's bf16*f32 multiply promotes the
        # panel value back exactly, so matvec results are BITWISE equal
        # to f32 panels while the dominant HBM stream halves (902 vs
        # 846 GB/s measured at 8M dof, 197 vs 344 us/matvec).
        if blk_dtype == "auto":
            blk_dtype = None
            if data.dtype == np.float32:
                rt = data.astype(jnp.bfloat16).astype(np.float32)
                if np.array_equal(rt, data):
                    blk_dtype = jnp.bfloat16
        dblk, plan = plan_dia(data, offsets, blk_dtype=blk_dtype)
        return DIAOperator(
            op.data, offsets, n, jnp.asarray(dblk), plan, at, symmetric,
            cs_coeffs, cs_deltas, cs_grid, cs_pallas,
        )
    return DIAOperator(
        op.data, offsets, n, None, None, at, symmetric,
        cs_coeffs, cs_deltas, cs_grid, cs_pallas, data_flat=flat,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "deltas", "grid", "dtype", "bm", "mpad", "blk_dt", "make_flat"
    ),
)
def _stencil_panels_device(coeffs, deltas, grid, dtype, bm, mpad, blk_dt,
                           make_flat):
    """Build DIA panels (+ streaming layout / flat twin) ON DEVICE.

    One compiled graph per (grid, deltas, dtypes) signature; coefficients
    ride as a tiny argument so every constant-stencil operator of the same
    shape shares the compile (and the committed .jax_cache entry)."""
    n = int(np.prod(grid))
    ndiag = len(deltas)
    rows = []
    for k, d in enumerate(deltas):
        mask = None
        for ax, di in enumerate(d):
            if di == 0:
                continue
            io = lax.broadcasted_iota(jnp.int32, grid, ax)
            m = (io + di >= 0) & (io + di < grid[ax])
            mask = m if mask is None else (mask & m)
        ck = coeffs[k].astype(dtype)
        if mask is None:
            row = jnp.full(grid, ck, dtype)
        else:
            row = jnp.where(mask, ck, jnp.zeros((), dtype))
        rows.append(row.reshape(-1))
    data = jnp.stack(rows)
    blk = None
    if blk_dt is not None:
        npad = mpad * 128
        db = jnp.zeros((ndiag, npad), blk_dt).at[:, :n].set(
            data.astype(blk_dt)
        )
        nblk = mpad // bm
        blk = (
            db.reshape(ndiag, nblk, bm, 128)
            .transpose(1, 0, 2, 3)
            .reshape(nblk * ndiag * bm, 128)
        )
    flat = data.reshape(-1) if make_flat else None
    return data, blk, flat


def stencil_to_dia(
    c, lo, hi, grid, dtype=np.float32, blk_dtype="auto", _with_at=True,
) -> DIAOperator:
    """Constant-coefficient separable stencil -> DIAOperator, built
    entirely ON DEVICE — no host panel assembly, no host->device upload.

    ``A[i, i] = c``; along each grid axis ``k`` (row-major flattening,
    stride ``s_k``), ``A[i, i - s_k] = lo[k]`` and ``A[i, i + s_k] =
    hi[k]`` wherever the neighbour exists (Dirichlet truncation at the
    boundary, identical to :func:`kryst_tpu.matrix.gallery.poisson_3d`).
    ``lo``/``hi`` may be scalars (same coefficient on every axis).

    Why: at 8M dof the host CSR assembly plus the ~340 MB panel/layout
    upload dominated GMG setup on this backend (round-5 stage 13); the
    panels of a constant stencil are pure index arithmetic, so one small
    compiled graph writes them (and the pre-blocked streaming layout of
    ops/streamed.py) straight into HBM. Bitwise-equal to the
    ``csr_to_dia(poisson_3d(...))`` path (asserted in
    tests/test_stencil_device.py). The reference assembles structured
    operators host-side and copies them in (src/matrix/sparse.rs:22-47,
    tests/preconditioner_integration.rs:16-33); this is the TPU-native
    replacement for its structured fixtures.
    """
    from kryst_tpu.ops.conststencil import pallas_geom_ok
    from kryst_tpu.ops.streamed import (
        DIAPlan, _plan_geometry, auto_block_rows,
    )

    grid = tuple(int(g) for g in grid)
    ndim = len(grid)
    if not isinstance(lo, (tuple, list)):
        lo = (lo,) * ndim
    if not isinstance(hi, (tuple, list)):
        hi = (hi,) * ndim
    lo = tuple(float(v) for v in lo)
    hi = tuple(float(v) for v in hi)
    if len(lo) != ndim or len(hi) != ndim:
        raise ValueError(f"lo/hi must have {ndim} per-axis coefficients")
    strides = [1] * ndim
    for ax in range(ndim - 2, -1, -1):
        strides[ax] = strides[ax + 1] * grid[ax + 1]
    ents = [(0, (0,) * ndim, float(c))]
    for ax in range(ndim):
        if lo[ax] != 0.0:
            d = tuple(-1 if a == ax else 0 for a in range(ndim))
            ents.append((-strides[ax], d, lo[ax]))
        if hi[ax] != 0.0:
            d = tuple(1 if a == ax else 0 for a in range(ndim))
            ents.append((strides[ax], d, hi[ax]))
    ents.sort(key=lambda e: e[0])
    offsets = tuple(e[0] for e in ents)
    deltas = tuple(e[1] for e in ents)
    dtype = np.dtype(dtype)
    coeffs_host = np.asarray([e[2] for e in ents], dtype=dtype)
    n = int(np.prod(grid))
    ndiag = len(offsets)
    # mirror _make_dia's dispatch: streaming layout beyond the VMEM
    # residency threshold (f64 never streams), flat twin otherwise —
    # except that a const-stencil f64 matvec uses the panel-free
    # const_spmv_xla form (see DIAOperator.matvec), so the flat twin
    # would be dead weight there
    resident = (ndiag + 3) * n * dtype.itemsize <= 96 * 1024 * 1024
    streaming = (not resident or ndiag > 8) and dtype.itemsize < 8
    blk_dt = None
    plan = None
    bm = mpad = 0
    if streaming:
        if blk_dtype == "auto":
            rt = coeffs_host.astype(jnp.bfloat16).astype(dtype)
            blk_dt = (
                np.dtype(jnp.bfloat16)
                if dtype == np.float32 and np.array_equal(rt, coeffs_host)
                else dtype
            )
        elif blk_dtype is None:
            blk_dt = dtype
        else:
            blk_dt = np.dtype(blk_dtype)
        bm0 = auto_block_rows(ndiag, blk_dt.itemsize)
        plan = _plan_geometry(n, offsets, bm0)
        if blk_dt.itemsize < 4 and plan.block_rows % 16:
            bm16 = -(-plan.block_rows // 16) * 16
            plan = DIAPlan(bm16, plan.margin, -(-plan.mpad // bm16) * bm16)
        bm, mpad = plan.block_rows, plan.mpad
    make_flat = (
        not streaming
        and dtype.itemsize < 8
        and ndiag * n * dtype.itemsize <= (512 << 20)
    )
    data, blk, flat = _stencil_panels_device(
        jnp.asarray(coeffs_host), deltas, grid, dtype, bm, mpad,
        blk_dt, make_flat,
    )
    symmetric = lo == hi
    at = None
    if not symmetric and _with_at and (streaming or not resident):
        at = stencil_to_dia(
            c, hi, lo, grid, dtype=dtype, blk_dtype=blk_dtype,
            _with_at=False,
        )
    return DIAOperator(
        data, offsets, n, blk, plan, at, symmetric,
        cs_coeffs=jnp.asarray(coeffs_host),
        cs_deltas=deltas,
        cs_grid=grid,
        cs_pallas=pallas_geom_ok(deltas, grid),
        data_flat=flat,
    )
