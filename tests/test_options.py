"""Config-system + observability coverage: solver options (norm types,
obj_target, NONE norm), string option parsing, profiling helpers."""
import jax.numpy as jnp
import numpy as np
import pytest

from kryst_tpu import NormType, cg
from kryst_tpu.api import PCConfig, parse_pc_options
from kryst_tpu.matrix import gallery
from kryst_tpu.utils.profiling import iteration_logger, timed


def test_cg_norm_none_runs_to_maxiter():
    # NormType.NONE: no convergence check — run exactly maxiter iterations
    A = gallery.poisson_2d(8).to_dense_operator()
    b = jnp.ones(64)
    x, st = cg(A, b, tol=1e-10, maxiter=7, norm_type=NormType.NONE)
    assert int(st.iterations) == 7
    assert bool(st.converged)  # reference maxiter quirk
    assert not bool(st.reached_tol)


def test_cg_obj_target_early_exit():
    # objective-target stop (cg.rs:231-252): exits once q(x) <= target
    A = gallery.poisson_2d(8).to_dense_operator()
    b = jnp.ones(64)
    x_star, st_full = cg(A, b, tol=1e-12, maxiter=500)
    q_star = float(
        0.5 * jnp.dot(x_star, A.matvec(x_star)) - jnp.dot(b, x_star)
    )
    # ask only for half the possible decrease
    x, st = cg(A, b, tol=1e-14, maxiter=500, obj_target=q_star / 2)
    assert int(st.iterations) < int(st_full.iterations)


def test_parse_pc_options():
    assert parse_pc_options({"pc_type": "none"}).kind == "none"
    assert parse_pc_options({"pc_type": "jacobi"}).kind == "jacobi"
    cfg = parse_pc_options({"pc_type": "ssor", "omega": 1.4})
    assert cfg.kind == "ssor" and dict(cfg.params)["omega"] == 1.4
    cfg = parse_pc_options({"pc_type": "ilut", "drop_tol": 1e-3})
    assert dict(cfg.params)["droptol"] == 1e-3
    with pytest.raises(ValueError):
        parse_pc_options({"pc_type": "bogus"})


def test_iteration_logger(capsys):
    cb = iteration_logger(every=2, prefix="t")
    cb(jnp.int32(2), jnp.float64(0.5))
    cb(jnp.int32(3), jnp.float64(0.25))  # suppressed (odd)
    out = capsys.readouterr().out
    assert "[t 2]" in out and "[t 3]" not in out


def test_timed_context(capsys):
    with timed("unit-test") as t:
        _ = jnp.ones(10).sum()
    assert t["seconds"] >= 0
    assert "unit-test" in capsys.readouterr().out


def test_pcconfig_gmg_builder():
    a = gallery.poisson_2d(16)
    cfg = PCConfig.gmg(grid=(16, 16), coarse_size=16)
    pc = cfg.build(a, dtype=np.float64)
    from kryst_tpu import pcg
    from kryst_tpu.ops.dia import csr_to_dia

    x, st = pcg(csr_to_dia(a), jnp.ones(256), M=pc, tol=1e-8, maxiter=100)
    assert bool(st.reached_tol)
