"""Fused-kernel fallback-path tests (the Pallas paths are exercised on real
TPU hardware; CPU tests pin the semantics both paths must share)."""
import jax.numpy as jnp
import numpy as np

from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import csr_to_dia
from kryst_tpu.ops.fused import cg_fused_update, dia_spmv_dot


def test_cg_fused_update_semantics():
    rng = np.random.default_rng(0)
    n = 1000
    x, p, r, q = (jnp.asarray(rng.standard_normal(n)) for _ in range(4))
    alpha = 0.37
    xo, ro, rr = cg_fused_update(x, p, r, q, alpha)
    np.testing.assert_allclose(np.asarray(xo), np.asarray(x + alpha * p), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ro), np.asarray(r - alpha * q), rtol=1e-12)
    np.testing.assert_allclose(
        float(rr), float(jnp.sum((r - alpha * q) ** 2)), rtol=1e-12
    )


def test_dia_spmv_dot_semantics():
    a = gallery.poisson_2d(12)
    A = csr_to_dia(a)
    p = jnp.asarray(np.random.default_rng(1).standard_normal(144))
    y, pap = dia_spmv_dot(A.data, A.offsets, p)
    yref = a.spmv(np.asarray(p))
    np.testing.assert_allclose(np.asarray(y), yref, rtol=1e-10)
    np.testing.assert_allclose(float(pap), float(np.dot(np.asarray(p), yref)), rtol=1e-10)
