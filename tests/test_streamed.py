"""Streamed DIA SpMV kernels (ops/streamed.py), interpret mode.

These are the beyond-VMEM hot-path kernels; on the CPU test backend they
run through the Pallas interpreter so the shift algebra (sublane window +
lane roll + one-row carry) and the pre-planned blocked coefficient layout
are checked exactly against the XLA reference form.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from kryst_tpu.ops.dia import dia_spmv_xla
from kryst_tpu.ops.streamed import dia_spmv_planned, dia_spmv_streamed, plan_dia


def _rand_case(n, offsets, seed=0):
    rng = np.random.default_rng(seed)
    offs = tuple(o for o in offsets if abs(o) < n)
    data = rng.standard_normal((len(offs), n)).astype(np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    return data, offs, jnp.asarray(x)


@pytest.mark.parametrize(
    "n,offsets",
    [
        (70_000, (-10_000, -128, -1, 0, 1, 128, 10_000)),  # 3-D stencil shape
        (5_000, (-300, -7, 0, 7, 300)),
        (66_000, (-65_536, 0, 65_536)),  # |offset| ~ n
        (1_000, (0,)),  # diagonal only, single block
    ],
)
def test_streamed_matches_xla(n, offsets):
    data, offs, x = _rand_case(n, offsets)
    y_ref = np.asarray(dia_spmv_xla(jnp.asarray(data), offs, x))
    y, pap = dia_spmv_streamed(
        jnp.asarray(data), offs, x, with_dot=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-5, atol=1e-4)
    ref_dot = float(np.asarray(x) @ y_ref)
    assert abs(float(pap) - ref_dot) <= 2e-4 * max(1.0, abs(ref_dot))


def test_planned_multi_chunk_matches_xla():
    n = 50_000
    data, offs, x = _rand_case(n, (-2_000, -128, -1, 0, 1, 128, 2_000), seed=3)
    y_ref = np.asarray(dia_spmv_xla(jnp.asarray(data), offs, x))
    dblk, plan = plan_dia(data, offs, block_rows=64)
    # tiny x budget -> forces the multi-chunk path (several kernel calls)
    y, pap = dia_spmv_planned(
        jnp.asarray(dblk), offs, x, plan,
        with_dot=True, interpret=True, x_budget_bytes=64 * 1024,
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-5, atol=1e-4)
    ref_dot = float(np.asarray(x) @ y_ref)
    assert abs(float(pap) - ref_dot) <= 2e-4 * max(1.0, abs(ref_dot))


def test_planned_single_chunk_matches_streamed():
    n = 4_096
    data, offs, x = _rand_case(n, (-64, 0, 64), seed=5)
    dblk, plan = plan_dia(data, offs, block_rows=8)
    y = dia_spmv_planned(jnp.asarray(dblk), offs, x, plan, interpret=True)
    y_ref = np.asarray(dia_spmv_xla(jnp.asarray(data), offs, x))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-5, atol=1e-4)


def test_planned_operator_roundtrip():
    # DIAOperator.planned() carries the layout; matvec stays exact
    from kryst_tpu.ops.dia import DIAOperator

    n = 2_048
    data, offs, x = _rand_case(n, (-32, -1, 0, 1, 32), seed=7)
    A = DIAOperator(jnp.asarray(data), offs, n).planned(block_rows=8)
    assert A.data_blk is not None and A.plan.block_rows == 8
    y_ref = np.asarray(dia_spmv_xla(jnp.asarray(data), offs, x))
    y = dia_spmv_planned(A.data_blk, A.offsets, x, A.plan, interpret=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-5, atol=1e-4)


def test_planned_bf16_panels():
    # bf16 coefficient panels: multiply promotes to x dtype; result within
    # bf16 rounding of the exact product
    n = 4_096
    data, offs, x = _rand_case(n, (-64, -1, 0, 1, 64), seed=9)
    dblk, plan = plan_dia(data, offs, blk_dtype=jnp.bfloat16)
    assert dblk.dtype == jnp.bfloat16 and plan.block_rows % 16 == 0
    y = dia_spmv_planned(jnp.asarray(dblk), offs, x, plan, interpret=True)
    assert y.dtype == jnp.float32
    y_ref = np.asarray(dia_spmv_xla(jnp.asarray(data), offs, x))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(np.asarray(y) / scale, y_ref / scale, atol=3e-2)


def test_planned_smooth_epilogue_matches_unfused():
    # fused damped-Jacobi epilogue (VERDICT r2 item 2): one streamed pass
    # computing z + omega*dinv*(r - A z), exact vs the unfused form
    import numpy as np
    from kryst_tpu.ops.dia import DIAOperator
    from kryst_tpu.ops.streamed import dia_spmv_planned

    rng = np.random.default_rng(0)
    n = 70000
    offs = (-263, -1, 0, 1, 263)
    data = rng.standard_normal((5, n)).astype(np.float32)
    op = DIAOperator(jnp.asarray(data), offs, n).planned(block_rows=256)
    z = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    r = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    dinv = jnp.asarray((1.0 / (1.0 + rng.random(n))).astype(np.float32))
    fused = dia_spmv_planned(
        op.data_blk, offs, z, op.plan,
        smooth_r=r, smooth_dinv=dinv, smooth_omega=0.7, interpret=True,
    )
    ref = z + 0.7 * dinv * (r - op.matvec(z))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)


def test_planned_shift_epilogue_matches_unfused():
    # fused CA-GMRES Newton-basis step (round-5): one streamed pass
    # computing (A u - re*u + imsq*u_prev)*inv_gamma AND sum(w*w); the
    # scalars are runtime (SMEM) operands because Newton shifts are
    # traced device values
    import numpy as np
    from kryst_tpu.ops.dia import DIAOperator
    from kryst_tpu.ops.streamed import dia_spmv_planned

    rng = np.random.default_rng(1)
    n = 70000
    offs = (-263, -1, 0, 1, 263)
    data = rng.standard_normal((5, n)).astype(np.float32)
    op = DIAOperator(jnp.asarray(data), offs, n).planned(block_rows=256)
    u = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    up = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    re, imsq, ginv = 0.37, 0.11, 0.83
    sc = jnp.asarray([[re, imsq, ginv]], jnp.float32)
    w, d2 = dia_spmv_planned(
        op.data_blk, offs, u, op.plan,
        with_dot=True, shift_prev=up, shift_scalars=sc, interpret=True,
    )
    ref = (op.matvec(u) - re * u + imsq * up) * ginv
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(
        float(d2), float(jnp.sum(ref * ref)), rtol=1e-4
    )
    # chunked path (multiple kernel calls): partial d2 sums must add up
    w2, d2_2 = dia_spmv_planned(
        op.data_blk, offs, u, op.plan,
        with_dot=True, shift_prev=up, shift_scalars=sc, interpret=True,
        x_budget_bytes=64 * 1024,
    )
    np.testing.assert_allclose(np.asarray(w2), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(float(d2_2), float(d2), rtol=1e-5)


@pytest.mark.parametrize(
    "n,k,offsets",
    [
        (40_000, 4, (-2_000, -128, -1, 0, 1, 128, 2_000)),
        (5_000, 8, (-300, -7, 0, 7, 300)),
        (3_000, 1, (-64, 0, 64)),
    ],
)
def test_planned_block_matches_xla(n, k, offsets):
    from kryst_tpu.ops.dia import dia_spmv_xla_block
    from kryst_tpu.ops.streamed import dia_spmv_planned_block

    data, offs, _ = _rand_case(n, offsets, seed=11)
    rng = np.random.default_rng(12)
    X = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    dblk, plan = plan_dia(data, offs, block_rows=64)
    Y = dia_spmv_planned_block(jnp.asarray(dblk), offs, X, plan, interpret=True)
    Y_ref = np.asarray(dia_spmv_xla_block(jnp.asarray(data), offs, X))
    np.testing.assert_allclose(np.asarray(Y), Y_ref, rtol=2e-5, atol=1e-4)


def test_planned_block_multi_chunk_matches_xla():
    # tiny budget -> several chunks; columns must stay aligned across the
    # chunk boundaries (halo windows per chunk)
    from kryst_tpu.ops.dia import dia_spmv_xla_block
    from kryst_tpu.ops.streamed import dia_spmv_planned_block

    n, k = 30_000, 3
    data, offs, _ = _rand_case(n, (-1_000, -128, -1, 0, 1, 128, 1_000), seed=13)
    rng = np.random.default_rng(14)
    X = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    dblk, plan = plan_dia(data, offs, block_rows=32)
    Y = dia_spmv_planned_block(
        jnp.asarray(dblk), offs, X, plan, interpret=True,
        x_budget_bytes=256 * 1024,
    )
    Y_ref = np.asarray(dia_spmv_xla_block(jnp.asarray(data), offs, X))
    np.testing.assert_allclose(np.asarray(Y), Y_ref, rtol=2e-5, atol=1e-4)

def test_planned_inter_with_gram_matches_xla():
    # fused G = X^T (A X) from the matvec kernel's resident blocks must
    # match the XLA reference Gram (block PCG's T = P^T Q fusion)
    from kryst_tpu.ops.dia import dia_spmv_xla_block
    from kryst_tpu.ops.streamed import (
        deinterleave_cols, dia_spmv_planned_inter, interleave_cols,
    )

    n, k = 20_000, 4
    data, offs, _ = _rand_case(n, (-1_000, -128, -1, 0, 1, 128, 1_000), seed=21)
    rng = np.random.default_rng(22)
    Xk = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    dblk, plan = plan_dia(data, offs, block_rows=64)
    assert plan.margin <= plan.block_rows
    Xi = interleave_cols(Xk, plan)
    Yi, G = dia_spmv_planned_inter(
        jnp.asarray(dblk), offs, Xi, plan, k, with_gram=True, interpret=True
    )
    Y = deinterleave_cols(Yi, plan, k, n)
    Y_ref = np.asarray(dia_spmv_xla_block(jnp.asarray(data), offs, Xk.T)).T
    np.testing.assert_allclose(np.asarray(Y), Y_ref, rtol=2e-5, atol=1e-4)
    G_ref = np.asarray(Xk) @ Y_ref.T
    np.testing.assert_allclose(np.asarray(G), G_ref, rtol=2e-4, atol=2e-3)
