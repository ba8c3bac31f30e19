"""Profiling / tracing helpers.

The reference's observability is limited to monitor callbacks and a stray
println! (SURVEY §5); here solvers additionally integrate with the JAX
profiler so hot kernels can be inspected in Perfetto/TensorBoard.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(dirname: str = "/tmp/kryst_trace"):
    """Capture a device trace around a block:

        with trace("/tmp/t"):
            x, stats = pcg(A, b, M=M)
            jax.block_until_ready(x)
    """
    jax.profiler.start_trace(dirname)
    try:
        yield dirname
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "block", sync=None):
    """Wall-clock a block, forcing device sync on ``sync`` (a pytree)."""
    t0 = time.time()
    out = {}
    try:
        yield out
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        out["seconds"] = time.time() - t0
        print(f"[kryst_tpu] {label}: {out['seconds']:.4f}s")


def iteration_logger(every: int = 1, prefix: str = "iter"):
    """Build a monitor callback that prints every ``every`` iterations —
    pairs with the ``monitor=`` parameter on cg/pcg/fgmres."""

    def cb(it, res):
        it = int(it)
        if it % every == 0:
            print(f"[{prefix} {it}] residual = {float(res):.6e}")

    return cb
