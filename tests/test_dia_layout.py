"""Round-5 DIA parameter-layout machinery (the "8x PCG regression" fix).

A 2-D (ndiag, n) panel crossing a jit boundary as an ARGUMENT gets a
sublane-tiled T(8,128) layout and in-loop row slices read 8x their
bytes (tools/tpu_r5_stage{1..5}.py). The fix is ``DIAOperator.data_flat``
(a dense 1-D twin of the panel) plus ``prepare()`` / ``prepare_loop()``
hoisting per-diagonal row views out of solver while_loops at trace time.
These tests lock the INVARIANT the fix relies on: every layout form
(2-D panel, flat slices, hoisted rows) computes bitwise-identical
matvecs, through jit and as jit arguments.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import DIAOperator, csr_to_dia
from kryst_tpu.solvers._common import prepare_loop


def _mk(n=18):
    a = gallery.poisson_2d(n)
    return csr_to_dia(a), jnp.asarray(
        np.random.default_rng(7).standard_normal(n * n)
    )


def test_data_flat_populated_and_consistent():
    A, x = _mk()
    # non-streaming construction populates the flat twin, matching the
    # 2-D panel elementwise
    assert A.data_flat is not None
    np.testing.assert_array_equal(
        np.asarray(A.data_flat).reshape(np.asarray(A.data).shape),
        np.asarray(A.data),
    )


def test_all_layout_forms_bitwise_equal():
    A, x = _mk()
    y_flat = A.matvec(x)
    # force the legacy 2-D panel path
    A_panel = dataclasses.replace(A, data_flat=None, data_rows=None)
    y_panel = A_panel.matvec(x)
    # hoisted-row form (what solvers run inside their while_loops)
    A_prep = A.prepare()
    y_rows = A_prep.matvec(x)
    np.testing.assert_array_equal(np.asarray(y_flat), np.asarray(y_panel))
    np.testing.assert_array_equal(np.asarray(y_flat), np.asarray(y_rows))


def test_prepare_idempotent_and_jit_argument_safe():
    A, x = _mk()
    Ap = A.prepare()
    assert Ap.data_rows is not None
    assert Ap.prepare() is Ap  # idempotent: no re-hoist
    # the no-flat case is a no-op, not an error
    A_panel = dataclasses.replace(A, data_flat=None, data_rows=None)
    assert A_panel.prepare() is A_panel

    # solver usage: operator arrives as a jit ARGUMENT, prepare() runs at
    # trace time inside — must round-trip the pytree (data_rows is a
    # registered data field) and match the eager result bitwise
    f = jax.jit(lambda Aa, xx: Aa.prepare().matvec(xx))
    np.testing.assert_array_equal(np.asarray(f(A, x)), np.asarray(A.matvec(x)))
    # a PREPARED operator as a jit argument also round-trips
    np.testing.assert_array_equal(
        np.asarray(f(Ap, x)), np.asarray(A.matvec(x))
    )


def test_prepare_loop_maps_trees_and_passes_foreign_leaves():
    A, x = _mk()
    B = csr_to_dia(gallery.poisson_2d(18), dtype=np.float64)
    tree = {"op": A, "levels": (B, None), "tag": 3}
    out = prepare_loop(tree)
    assert out["op"].data_rows is not None
    assert out["levels"][0].data_rows is not None
    assert out["levels"][1] is None and out["tag"] == 3
    np.testing.assert_array_equal(
        np.asarray(out["op"].matvec(x)), np.asarray(A.matvec(x))
    )
    # None and bare callables pass through unchanged
    assert prepare_loop(None) is None
    fn = lambda r: r  # noqa: E731
    assert prepare_loop(fn) is fn


def test_pcg_with_and_without_prepare_identical():
    # end-to-end: the hoisting must not change a single bit of the solve
    from kryst_tpu import JacobiPC, pcg

    A, _ = _mk()
    b = jnp.ones(A.n, dtype=A.dtype)
    M = JacobiPC.setup(A)
    x1, s1 = jax.jit(
        lambda Aa, bb, Mm: pcg(Aa, bb, M=Mm, tol=1e-10, maxiter=500)
    )(A, b, M)
    A_panel = dataclasses.replace(A, data_flat=None, data_rows=None)
    x2, s2 = jax.jit(
        lambda Aa, bb, Mm: pcg(Aa, bb, M=Mm, tol=1e-10, maxiter=500)
    )(A_panel, b, M)
    assert int(s1.iterations) == int(s2.iterations)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
