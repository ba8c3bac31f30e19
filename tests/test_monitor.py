"""Monitor-callback coverage (VERDICT r3 item 3).

The reference's ``monitor`` FnMut(iter, res_norm) (cg.rs:84-88,
pcg.rs:82-86, fgmres.rs:93-97) works on every backend; kryst_tpu's
in-jit ``jax.debug.callback`` path raises UNIMPLEMENTED on the axon
remote-TPU backend. These tests pin the TPU-functional design:

- ``emit_monitor`` fires live where host callbacks work (CPU here) and
  degrades to a SILENT NO-OP — never a crash — where they don't
  (simulated by forcing the support probe off);
- ``solve(monitor=...)`` replays the device-recorded residual history
  host-side, identically on every backend.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from kryst_tpu import JacobiPC, pcg, solve
from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import csr_to_dia
from kryst_tpu.solvers import _common


@pytest.fixture
def poisson64():
    a = gallery.poisson_2d(8)
    A = csr_to_dia(a, dtype=np.float64)
    b = jnp.ones(64, jnp.float64)
    return a, A, b


def test_live_monitor_matches_history_on_cpu(poisson64):
    """Where debug.callback works, the live monitor sees exactly the
    per-iteration residuals the history buffer records."""
    _a, A, b = poisson64
    seen = []
    x, st = pcg(
        A, b, M=JacobiPC.setup(A), tol=1e-10, maxiter=200,
        monitor=lambda it, res: seen.append((int(it), float(res))),
        record_history=True,
    )
    assert seen, "live monitor never fired on a backend that supports it"
    hist = np.asarray(st.residual_history)
    for it, res in seen:
        assert res == pytest.approx(float(hist[it]), rel=1e-12)
    assert seen[-1][0] == int(st.iterations)


def test_emit_monitor_noop_when_callbacks_unsupported(poisson64, monkeypatch):
    """Axon-backend guard: with host callbacks unavailable the solver
    must still run to convergence and the monitor must simply not fire
    (the crash mode this test pins: debug.callback -> UNIMPLEMENTED)."""
    _a, A, b = poisson64
    monkeypatch.setattr(_common, "_CALLBACKS_OK", False)
    seen = []
    x, st = pcg(
        A, b, M=JacobiPC.setup(A), tol=1e-10, maxiter=200,
        monitor=lambda it, res: seen.append(it),
    )
    assert bool(st.reached_tol)
    assert seen == []


def test_solve_monitor_replays_history_any_backend(poisson64, monkeypatch):
    """solve(monitor=...) must deliver the same (iter, res) sequence with
    and without host-callback support."""
    a, _A, b = poisson64

    def run():
        seen = []
        x, st = solve(
            a, b, solver="pcg", pc="jacobi", tol=1e-10, maxiter=200,
            monitor=lambda it, res: seen.append((it, res)),
        )
        return seen, st

    seen_live, st1 = run()
    monkeypatch.setattr(_common, "_CALLBACKS_OK", False)
    seen_noncb, st2 = run()
    assert seen_live == seen_noncb
    hist = np.asarray(st1.residual_history)
    its = [it for it, _ in seen_live]
    assert its == sorted(its) and its[0] == 0
    assert len(seen_live) == np.sum(~np.isnan(hist))


def test_solve_monitor_gmres(poisson64):
    a = gallery.convection_diffusion_2d(8, beta=2.0)
    b = jnp.ones(64, jnp.float64)
    seen = []
    x, st = solve(
        a, b, solver="gmres_right", pc="jacobi", tol=1e-8, maxiter=100,
        restart=10, monitor=lambda it, res: seen.append((it, res)),
    )
    assert seen and seen[0][0] == 0
    # residual estimates decrease overall (nonmonotone per restart is ok)
    assert seen[-1][1] < seen[0][1]


def test_replay_monitor_counts_and_rejects_batched(poisson64):
    _a, A, b = poisson64
    x, st = pcg(A, b, M=JacobiPC.setup(A), tol=1e-10, maxiter=200,
                record_history=True)
    got = []
    n = _common.replay_monitor(lambda i, r: got.append((i, r)), st)
    assert n == len(got) > 0

    class Fake:
        residual_history = jnp.zeros((3, 4))

    with pytest.raises(ValueError, match="1-D"):
        _common.replay_monitor(lambda i, r: None, Fake())
    assert _common.replay_monitor(None, st) == 0


def test_solve_monitor_rejects_direct_and_block(poisson64):
    a, _A, b = poisson64
    with pytest.raises(ValueError, match="direct"):
        solve(a, b, solver="lu", monitor=lambda i, r: None)
    B = jnp.stack([b, 2 * b], axis=1)
    with pytest.raises(ValueError, match="single-RHS"):
        solve(a, B, solver="pcg", pc="jacobi", monitor=lambda i, r: None)
