"""Constant-stencil SpMV (ops/conststencil.py), interpret mode.

Detection must be EXACT (bitwise) so substituting the zero-coefficient-
traffic kernel for the streamed DIA kernel changes only float summation
order; these tests pin the detection predicate, the mask algebra of the
kernel (inner-axis boundary wraps), the fused epilogues, and the
dispatch wiring through DIAOperator/GMG setup.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from kryst_tpu.ops.conststencil import (
    const_spmv,
    decompose_offset,
    detect_stencil,
)
from kryst_tpu.ops.dia import dia_spmv_xla, scipy_to_dia


def _lap1(n):
    return sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n))


def _poisson3(gx, gy, gz):
    return (
        sp.kron(sp.kron(_lap1(gx), sp.eye(gy)), sp.eye(gz))
        + sp.kron(sp.kron(sp.eye(gx), _lap1(gy)), sp.eye(gz))
        + sp.kron(sp.kron(sp.eye(gx), sp.eye(gy)), _lap1(gz))
    ).tocsr()


def test_decompose_offset():
    grid = (6, 130, 140)
    assert decompose_offset(1, grid) == (0, 0, 1)
    assert decompose_offset(-140, grid) == (0, -1, 0)
    assert decompose_offset(130 * 140, grid) == (1, 0, 0)
    assert decompose_offset(140 + 1, grid) == (0, 1, 1)
    # not reachable with small deltas
    assert decompose_offset(77, grid, reach=8) is None


def test_detect_and_match_3d():
    grid = (6, 130, 140)
    A = scipy_to_dia(_poisson3(*grid), dtype=np.float32)
    det = detect_stencil(np.asarray(A.data), A.offsets, grid)
    assert det is not None
    coeffs, deltas, pallas_ok = det
    assert pallas_ok  # inner axes 130, 140 >= 128
    assert (0, 0, 0) in deltas
    np.testing.assert_array_equal(np.sort(coeffs), [-1, -1, -1, -1, -1, -1, 6])

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(int(np.prod(grid))).astype(np.float32))
    y_ref = np.asarray(dia_spmv_xla(A.data, A.offsets, x))
    y = const_spmv(jnp.asarray(coeffs), A.offsets, deltas, grid, x,
                   interpret=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-5, atol=1e-4)

    # fused dot
    y2, d2 = const_spmv(jnp.asarray(coeffs), A.offsets, deltas, grid, x,
                        with_dot=True, interpret=True)
    ref_dot = float(np.asarray(x) @ y_ref)
    assert abs(float(d2) - ref_dot) <= 1e-4 * abs(ref_dot) + 1e-4

    # fused damped-Jacobi epilogue
    z = jnp.asarray(rng.standard_normal(x.shape[0]).astype(np.float32))
    r = jnp.asarray(rng.standard_normal(x.shape[0]).astype(np.float32))
    dinv = jnp.full(x.shape, 1.0 / 6.0, jnp.float32)
    zs = const_spmv(jnp.asarray(coeffs), A.offsets, deltas, grid, x,
                    smooth_z=z, smooth_r=r, smooth_dinv=dinv,
                    smooth_omega=0.7, interpret=True)
    zs_ref = z + 0.7 * dinv * (r - dia_spmv_xla(A.data, A.offsets, z))
    np.testing.assert_allclose(np.asarray(zs), np.asarray(zs_ref),
                               rtol=2e-5, atol=1e-4)

    # chunked windows (tiny budget) must agree too
    y3 = const_spmv(jnp.asarray(coeffs), A.offsets, deltas, grid, x,
                    interpret=True, x_budget_bytes=96 * 1024, block_rows=32)
    np.testing.assert_allclose(np.asarray(y3), y_ref, rtol=2e-5, atol=1e-4)


def test_detect_and_match_2d():
    grid = (9, 200)
    A2 = scipy_to_dia(
        (sp.kron(_lap1(9), sp.eye(200)) + sp.kron(sp.eye(9), _lap1(200))).tocsr(),
        dtype=np.float32,
    )
    det = detect_stencil(np.asarray(A2.data), A2.offsets, grid)
    assert det is not None
    c2, d2, _ = det
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(9 * 200).astype(np.float32))
    y_ref = np.asarray(dia_spmv_xla(A2.data, A2.offsets, x))
    y = const_spmv(jnp.asarray(c2), A2.offsets, d2, grid, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-5, atol=1e-4)


def test_detection_rejects():
    grid = (9, 200)
    A2 = scipy_to_dia(
        (sp.kron(_lap1(9), sp.eye(200)) + sp.kron(sp.eye(9), _lap1(200))).tocsr(),
        dtype=np.float32,
    )
    data = np.asarray(A2.data).copy()
    data[0, 500] *= 1.0001  # one perturbed interior entry -> not constant
    assert detect_stencil(data, A2.offsets, grid) is None
    # masked inner axis narrower than 128 lanes: detection still succeeds
    # (the XLA form is exact on any grid) but pallas_ok must be False
    A3 = scipy_to_dia(
        (sp.kron(_lap1(50), sp.eye(50)) + sp.kron(sp.eye(50), _lap1(50))).tocsr(),
        dtype=np.float32,
    )
    det3 = detect_stencil(np.asarray(A3.data), A3.offsets, (50, 50))
    assert det3 is not None and det3[2] is False
    # grid/n mismatch
    assert detect_stencil(np.asarray(A2.data), A2.offsets, (9, 199)) is None


def _pent1(n):
    # constant pentadiagonal Toeplitz: each diagonal is ONE value over its
    # full in-bounds range (unlike e.g. L @ L, whose boundary rows differ)
    return sp.diags([-1.0, -2.0, 8.0, -2.0, -1.0], [-2, -1, 0, 1, 2],
                    shape=(n, n))


def _pent3(gx, gy, gz):
    """13-point exactly-constant stencil (2nd-order bands per axis)."""
    return (
        sp.kron(sp.kron(_pent1(gx), sp.eye(gy)), sp.eye(gz))
        + sp.kron(sp.kron(sp.eye(gx), _pent1(gy)), sp.eye(gz))
        + sp.kron(sp.kron(sp.eye(gx), sp.eye(gy)), _pent1(gz))
    ).tocsr()


def test_dispatch_fields_via_grid():
    """A many-diagonal constant operator built with grid= carries the
    const-stencil fields (streaming trigger: ndiag > 8)."""
    gx, gy, gz = 4, 130, 140
    A27 = _pent3(gx, gy, gz)  # 13-point, exactly constant-coefficient
    op = scipy_to_dia(A27, dtype=np.float32, grid=(gx, gy, gz))
    assert op.cs_deltas is not None and op.cs_grid == (gx, gy, gz)
    # round-3 policy: const operators ALSO carry the planned layout —
    # planned streaming measured FASTER than the const Pallas kernel
    # (344.5 vs 377.2 us at 8M), and matvec prefers it (ops/dia.py)
    assert op.data_blk is not None
    # and without grid= the same operator takes the planned streaming path
    op_plain = scipy_to_dia(A27, dtype=np.float32)
    assert op_plain.cs_deltas is None and op_plain.data_blk is not None
    # matvec on CPU routes to XLA either way; check numerical agreement
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(op.n).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(op_plain.matvec(x)),
        rtol=2e-5, atol=1e-4,
    )
    # the const kernel itself matches as well (interpret mode)
    y = const_spmv(op.cs_coeffs, op.offsets, op.cs_deltas, op.cs_grid, x,
                   interpret=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(op_plain.matvec(x)), rtol=2e-5, atol=2e-4
    )


def test_narrow_grid_keeps_xla_form_and_plan():
    """Masked inner axes < 128: detection succeeds (cs fields present,
    f64/CPU matvec takes the exact shifted-slice XLA form) but the Pallas
    kernel is disallowed (cs_pallas False) and beyond-VMEM f32 operators
    keep the planned streaming layout."""
    gx, gy, gz = 4, 100, 100  # the 1M-headline 100^3 shape class
    A = _pent3(gx, gy, gz)  # 13 diagonals -> streaming trigger ndiag > 8
    op = scipy_to_dia(A, dtype=np.float32, grid=(gx, gy, gz))
    assert op.cs_deltas is not None and op.cs_pallas is False
    assert op.data_blk is not None  # streaming path still needs the plan
    op64 = scipy_to_dia(A, dtype=np.float64, grid=(gx, gy, gz))
    assert op64.cs_deltas is not None and op64.cs_pallas is False
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(op64.n))
    y = np.asarray(op64.matvec(x))  # CPU: const_spmv_xla route
    y_ref = np.asarray(dia_spmv_xla(op64.data, op64.offsets, x))
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-12)


def test_gmg_setup_detects_const_l0():
    """GMG setup passes grid= per level; on a 27-point constant operator
    L0 gets the const-stencil fields and the V-cycle still converges."""
    from kryst_tpu.matrix import gallery
    from kryst_tpu.pc.gmg import GMGPC
    from kryst_tpu.solvers.cg import pcg

    gx, gy, gz = 4, 130, 140
    A27 = _pent3(gx, gy, gz)
    from kryst_tpu.matrix.csr import CSRMatrix

    a = CSRMatrix(
        data=A27.data.astype(np.float64), indices=A27.indices,
        indptr=A27.indptr, shape=A27.shape,
    )
    pc = GMGPC.setup(a, grid=(gx, gy, gz), dtype=np.float64,
                     max_levels=2, coarse_size=3000)
    # f64 never uses the const path on device, but detection is
    # dtype-independent: build the f32 variant and check the fields
    pc32 = GMGPC.setup(a, grid=(gx, gy, gz), dtype=np.float32,
                       max_levels=2, coarse_size=3000)
    assert pc32.levels[0].A.cs_deltas is not None
    A = a.to_device_operator(np.float64)
    b = jnp.ones(gx * gy * gz, jnp.float64)
    x, st = pcg(A, b, M=pc, tol=1e-8, maxiter=200)
    assert bool(st.reached_tol)
