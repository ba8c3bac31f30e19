"""Regression tests for the round-2 advisor findings (ADVICE.md).

1. refine_device fails fast instead of silently certifying f32 residuals.
2. DIAOperator.planned() honors block_rows and blk_dtype=None re-planning.
3. _plan_geometry rounds caller block_rows to the 8-row sublane tile.
4. rmatvec uses symmetry / a pre-planned transpose instead of an in-jit
   re-layout on the XLA cliff path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import (
    DIAOperator,
    csr_to_dia,
    dia_transpose_host,
    scipy_to_dia,
)
from kryst_tpu.ops.streamed import _plan_geometry


def test_refine_device_rejects_low_precision_operator():
    from kryst_tpu.solvers.refine import refine_device

    a = gallery.poisson_2d(8)
    A32 = csr_to_dia(a, dtype=np.float32)
    b = jnp.ones(64)
    with pytest.raises(ValueError, match="f64 operator"):
        refine_device(A32, b, lambda r: (r, None))


def test_planned_respects_block_rows_and_replan_to_full_precision():
    d = np.random.default_rng(0).random((3, 5000)).astype(np.float32)
    base = DIAOperator(jnp.asarray(d), (-1, 0, 1), 5000)
    p8 = base.planned(block_rows=8)
    assert p8.planned(block_rows=8) is p8  # no-op: same size
    p16 = p8.planned(block_rows=16)
    assert p16 is not p8 and p16.plan.block_rows == 16
    pb = p16.planned(blk_dtype=jnp.bfloat16)
    assert pb.data_blk.dtype == jnp.bfloat16
    pf = pb.planned()  # blk_dtype=None = data dtype: back to full precision
    assert pf.data_blk.dtype == jnp.float32


def test_plan_geometry_rounds_block_rows_to_sublane_tile():
    plan = _plan_geometry(1_000_000, (-100, 0, 100), 100)
    assert plan.block_rows % 8 == 0 and plan.block_rows >= 100
    assert plan.mpad % plan.block_rows == 0


def test_dia_transpose_host_matches_scipy():
    rng = np.random.default_rng(1)
    n = 300
    A = sp.diags(
        [rng.standard_normal(n - 5), rng.standard_normal(n),
         rng.standard_normal(n - 2)],
        [-5, 0, 2], format="csr",
    )
    op = scipy_to_dia(A, dtype=np.float64)
    data_t, offs_t = dia_transpose_host(
        np.asarray(op.data), op.offsets, n
    )
    opt = DIAOperator(jnp.asarray(data_t), offs_t, n)
    x = rng.standard_normal(n)
    np.testing.assert_allclose(
        np.asarray(opt.matvec(jnp.asarray(x))), A.T @ x, atol=1e-12
    )


def test_symmetric_detection_makes_rmatvec_matvec():
    op = csr_to_dia(gallery.poisson_2d(16), dtype=np.float64)
    assert op.symmetric
    x = jnp.asarray(np.random.default_rng(2).standard_normal(256))
    np.testing.assert_allclose(
        np.asarray(op.rmatvec(x)), np.asarray(op.matvec(x)), atol=0
    )


def test_nonsymmetric_forced_transpose_rmatvec_parity():
    rng = np.random.default_rng(3)
    n = 400
    A = sp.diags(
        [rng.standard_normal(n - 3), 4 + rng.random(n),
         rng.standard_normal(n - 1)],
        [-3, 0, 1], format="csr",
    )
    op = scipy_to_dia(A, dtype=np.float64, transpose=True)
    assert not op.symmetric and op.at is not None
    x = rng.standard_normal(n)
    np.testing.assert_allclose(
        np.asarray(op.rmatvec(jnp.asarray(x))), A.T @ x, atol=1e-12
    )
    # pytree roundtrip keeps the cached transpose
    leaves, tree = jax.tree_util.tree_flatten(op)
    op2 = jax.tree_util.tree_unflatten(tree, leaves)
    np.testing.assert_allclose(
        np.asarray(op2.rmatvec(jnp.asarray(x))), A.T @ x, atol=1e-12
    )


def test_solve_f32_floor_auto_refines_to_true_tol():
    # VERDICT r2 item 7: solve(tol=1e-8) in f32 on Poisson 128^2 must
    # return a TRUE 1e-8 solution (refined) or a loud diagnostic — never
    # a silent reached_tol=False.
    import warnings

    from kryst_tpu.api import solve

    a = gallery.poisson_2d(128)
    b = jnp.asarray(
        np.random.default_rng(0).standard_normal(128 * 128), jnp.float32
    )
    x, st = solve(a, b, solver="pcg", pc="jacobi", tol=1e-8, maxiter=3000)
    assert bool(st.reached_tol) and st.refined is not None and bool(st.refined)
    As = sp.csr_matrix(
        (a.data.astype(np.float64), a.indices, a.indptr), shape=a.shape
    )
    true_rel = np.linalg.norm(
        np.asarray(b, np.float64) - As @ np.asarray(x, np.float64)
    ) / np.linalg.norm(np.asarray(b, np.float64))
    assert true_rel <= 1e-8

    # explicit opt-out is loud, not silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _, st2 = solve(
            a, b, solver="pcg", pc="jacobi", tol=1e-8, maxiter=3000,
            refine=False,
        )
    assert not bool(st2.reached_tol)
    assert any("floor" in str(x.message) for x in w)


def test_solve_autorefine_x0_reports_rel_vs_b():
    """r3 review: with a good x0, refinement works on the SHIFTED system
    b - A x0; stats must still report rel_residual vs b (not the shifted
    rhs) and reached_tol must mean ||b - A x|| <= tol * ||b||."""
    from kryst_tpu.api import solve

    a = gallery.poisson_2d(64)
    n = 64 * 64
    b = jnp.asarray(np.random.default_rng(1).standard_normal(n), jnp.float32)
    x_ref, _ = solve(a, b, solver="pcg", pc="jacobi", tol=1e-8, maxiter=3000)
    x0 = jnp.asarray(np.asarray(x_ref), jnp.float32)  # near-solution guess
    x, st = solve(a, b, x0=x0, solver="pcg", pc="jacobi", tol=1e-8,
                  maxiter=3000)
    As = sp.csr_matrix(
        (a.data.astype(np.float64), a.indices, a.indptr), shape=a.shape
    )
    true_rel = np.linalg.norm(
        np.asarray(b, np.float64) - As @ np.asarray(x, np.float64)
    ) / np.linalg.norm(np.asarray(b, np.float64))
    assert true_rel <= 1e-8
    if st.refined is not None and bool(st.refined):
        # reported rel must be on the b base, within refinement slack
        assert float(st.rel_residual) <= 1.1e-8
        assert bool(st.reached_tol)
