"""Device-side Galerkin RAP by stencil probing (pc/rap_probe.py) vs the
host scipy SpGEMM hierarchy — the two setups must produce the same
coarse operators (same arithmetic up to summation order; CPU f64 here,
so agreement is ~1e-13 relative)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from kryst_tpu import JacobiPC
from kryst_tpu.matrix import gallery
from kryst_tpu.pc.gmg import GMGPC
from kryst_tpu.pc.rap_probe import dia_to_dense_host


def _dense_level(level_op):
    return dia_to_dense_host(
        np.asarray(jax.device_get(level_op.data)),
        level_op.offsets,
        level_op.shape[0],
    )


def _compare_hierarchies(a, grid, **kw):
    host = GMGPC.setup(a, grid, rap="host", **kw)
    probe = GMGPC.setup(a, grid, rap="probe", **kw)
    assert len(host.levels) == len(probe.levels), (
        len(host.levels), len(probe.levels),
    )
    # level 0 is identical by construction; compare every COARSE operator
    for l in range(1, len(host.levels)):
        Dh = _dense_level(host.levels[l].A)
        Dp = _dense_level(probe.levels[l].A)
        scale = np.abs(Dh).max()
        np.testing.assert_allclose(Dp, Dh, atol=5e-13 * scale, rtol=0)
    # bottom-level dense inverse built from the probed data
    np.testing.assert_allclose(
        np.asarray(probe.coarse_inv), np.asarray(host.coarse_inv),
        atol=1e-10 * np.abs(np.asarray(host.coarse_inv)).max(),
    )
    return host, probe


def test_probe_matches_host_2d_poisson_rect():
    a = gallery.poisson_2d(20, 14)  # non-square, even dims
    _compare_hierarchies(a, (20, 14), coarse_size=16)


def test_probe_matches_host_2d_odd_dims():
    a = gallery.poisson_2d(17, 13)  # odd dims: ragged aggregates
    _compare_hierarchies(a, (17, 13), coarse_size=16)


def test_probe_matches_host_3d():
    a = gallery.poisson_3d(9)  # odd 3-D
    _compare_hierarchies(a, (9, 9, 9), coarse_size=8)


def test_probe_matches_host_unsmoothed_deep():
    # smooth_levels=1 exercises the unsmoothed-P0 reach arithmetic on
    # deeper levels; 32^2 gives a 3+ level hierarchy
    a = gallery.poisson_2d(32)
    host, probe = _compare_hierarchies(
        a, (32, 32), coarse_size=16, smooth_levels=1
    )
    assert len(host.levels) >= 3


def test_probe_nonsymmetric_transpose():
    # convection-diffusion: nonsymmetric, so probe mode must also build
    # the transposed coarse operators (P^T A^T P) for restrict()
    a = gallery.convection_diffusion_2d(16, beta=8.0)
    host, probe = _compare_hierarchies(a, (16, 16), coarse_size=16)
    for l in range(1, len(probe.levels)):
        lvl = probe.levels[l]
        assert lvl.At is not lvl.A
        Dt = _dense_level(lvl.At)
        D = _dense_level(lvl.A)
        scale = np.abs(D).max()
        np.testing.assert_allclose(Dt, D.T, atol=5e-13 * scale, rtol=0)


def test_probe_vcycle_apply_matches_host():
    a = gallery.poisson_2d(24)
    host, probe = _compare_hierarchies(a, (24, 24), coarse_size=16)
    r = jnp.asarray(
        np.random.default_rng(3).standard_normal(24 * 24)
    )
    zh = jax.jit(host.apply)(r)
    zp = jax.jit(probe.apply)(r)
    np.testing.assert_allclose(
        np.asarray(zp), np.asarray(zh),
        atol=1e-11 * float(jnp.max(jnp.abs(zh))),
    )


def test_probe_chebyshev_bounds_match():
    a = gallery.poisson_2d(24)
    host = GMGPC.setup(a, (24, 24), smoother="chebyshev", coarse_size=16)
    probe = GMGPC.setup(
        a, (24, 24), smoother="chebyshev", coarse_size=16, rap="probe"
    )
    assert len(host.cheb_pre) == len(probe.cheb_pre)
    for oh, op_ in zip(host.cheb_pre, probe.cheb_pre):
        np.testing.assert_allclose(op_, oh, rtol=1e-10)


def test_probe_pcg_iteration_parity():
    # eager solve on a 2-level hierarchy: jitting pcg over a deep GMGPC
    # pytree segfaulted XLA:CPU twice under full-suite memory pressure
    # (compile of one more large module in a long-lived process); the
    # iteration-parity claim needs no jit.
    from kryst_tpu.ops.dia import csr_to_dia
    from kryst_tpu.solvers.cg import pcg

    a = gallery.poisson_2d(24)
    A = csr_to_dia(a, dtype=np.float64)
    b = jnp.ones(24 * 24)
    host = GMGPC.setup(a, (24, 24), coarse_size=128)
    probe = GMGPC.setup(a, (24, 24), coarse_size=128, rap="probe")
    _, sh = pcg(A, b, M=host, tol=1e-10, maxiter=400)
    _, sp_ = pcg(A, b, M=probe, tol=1e-10, maxiter=400)
    assert int(sh.iterations) == int(sp_.iterations)
    assert bool(sh.reached_tol) and bool(sp_.reached_tol)


def test_probe_rejects_bad_rap_arg():
    a = gallery.poisson_2d(8)
    with pytest.raises(ValueError, match="rap"):
        GMGPC.setup(a, (8, 8), rap="banana")


def test_bf16_exact_is_bitwise_not_roundtrip():
    """_bf16_exact must be a BITWISE low-mantissa test.

    The obvious x.astype(bf16).astype(f32) == x form is folded to
    identity by XLA's algebraic simplifier inside jit on the TPU backend
    (always-true — round-5 on-chip finding: every probed coarse panel
    silently went lossy-bf16 and 2-D probe V-cycles turned indefinite,
    PCG beta<0 at iteration 1). The bitwise form is fold-proof and must
    classify exactly."""
    from kryst_tpu.pc.rap_probe import _bf16_exact

    exact = np.array([1.0, -1.0, 6.0, 0.375, 2.0 ** -30, 0.0, -256.0],
                     np.float32)
    assert bool(_bf16_exact(jnp.asarray(exact)))
    for bad in (2.944444, 1.00390625, np.float32(1) + np.float32(2 ** -12)):
        v = np.asarray([1.0, bad], np.float32)
        # host numpy round-trip is the ground truth
        assert not np.array_equal(
            v.astype(jnp.bfloat16).astype(np.float32), v
        )
        assert not bool(_bf16_exact(jnp.asarray(v)))
