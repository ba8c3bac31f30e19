"""Shared solver utilities: inner products, history buffers, identity PC.

The inner-product helpers are the TPU-native `InnerProduct` trait
(reference src/core/traits.rs:16-23 and the Rayon-parallel impls in
src/core/wrappers.rs:87-128). They reduce over the *local* axis only; the
distributed variant (`DistributedInnerProduct`, wrappers.rs:134-156) is the
same call inside ``shard_map`` where the mesh axis name triggers a psum —
see kryst_tpu/parallel/.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def dot(u, v, axis_name: Optional[str] = None):
    """<u, v> with optional mesh-axis reduction (psum over ICI)."""
    local = jnp.sum(u * v)
    if axis_name is not None:
        local = lax.psum(local, axis_name)
    return local


def norm(u, axis_name: Optional[str] = None):
    return jnp.sqrt(dot(u, u, axis_name))


def fused_dots(pairs, axis_name: Optional[str] = None):
    """Compute several inner products with ONE reduction.

    The TPU analogue of the reference's ``single_reduction`` fused dot
    (cg.rs:146-165) and the PCA-GMRES flat reduction buffer
    (pca_gmres.rs:172-211): stack the partial products so XLA emits a
    single fused reduction (and a single psum on a mesh).
    """
    locals_ = jnp.stack([jnp.sum(u * v) for (u, v) in pairs])
    if axis_name is not None:
        locals_ = lax.psum(locals_, axis_name)
    return tuple(locals_[i] for i in range(len(pairs)))


def identity_apply(state, r):
    return r


def init_history(maxiter: int, res0, record: bool):
    """Fixed-size residual-history buffer (NaN-padded) or None."""
    if not record:
        return None
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=jnp.asarray(res0).dtype)
    return hist.at[0].set(res0)


def push_history(hist, i, res):
    if hist is None:
        return None
    return hist.at[i].set(res)


_CALLBACKS_OK: Optional[bool] = None


def callbacks_supported() -> bool:
    """Whether ``jax.debug.callback`` works on the current backend.

    The axon remote-TPU backend raises UNIMPLEMENTED on every host
    callback (pure_callback / io_callback / debug.callback), so live
    in-jit monitors are impossible there — monitoring rides the
    device-side residual-history buffer instead, replayed host-side by
    :func:`replay_monitor` (which ``solve(monitor=...)`` does
    automatically on every backend)."""
    global _CALLBACKS_OK
    if _CALLBACKS_OK is None:
        try:
            _CALLBACKS_OK = jax.default_backend() not in ("axon",)
        except Exception:  # pragma: no cover - backend probe failure
            _CALLBACKS_OK = False
    return _CALLBACKS_OK


def emit_monitor(monitor, it, res):
    """Per-iteration monitor callback (reference ``monitor`` FnMut(iter,
    res_norm), cg.rs:84-88 / pcg.rs:82-86 / fgmres.rs:93-97). Implemented
    with ``jax.debug.callback`` so it fires from inside jit — ordered,
    host-side, zero effect on the compiled computation.

    On backends without host-callback support (see
    :func:`callbacks_supported`) this is a silent no-op rather than a
    crash; use ``record_history=True`` + :func:`replay_monitor`, or the
    ``solve(monitor=...)`` entry point which does both."""
    if monitor is not None and callbacks_supported():
        jax.debug.callback(monitor, it, res, ordered=True)


def replay_monitor(monitor, stats) -> int:
    """Host-side replay of a solve's per-iteration residuals into a
    reference-style ``monitor(iter, res_norm)`` callback.

    Reads ``stats.residual_history`` (the NaN-padded fixed-size buffer
    every solver fills under ``record_history=True``) AFTER the solve —
    the TPU-functional monitor path: the device records, the host
    replays. Returns the number of entries delivered (0 when no history
    was recorded)."""
    if monitor is None:
        return 0
    hist = getattr(stats, "residual_history", None)
    if hist is None:
        return 0
    import numpy as np

    h = np.asarray(hist)
    if h.ndim != 1:
        raise ValueError(
            "replay_monitor needs a single solve's history (1-D); got "
            f"shape {h.shape} — replay per column for batched solves"
        )
    count = 0
    for i, r in enumerate(h):
        if np.isnan(r):
            continue
        monitor(i, float(r))
        count += 1
    return count


def prepare_loop(tree):
    """Trace-time hoist of DIA coefficient-row views over an operator or
    preconditioner pytree — call at solver entry, BEFORE the while_loop.

    Why: a (ndiag, n) DIA panel crossing a jit boundary as an ARGUMENT
    is sublane-tiled and its in-loop row slices read 8x their bytes
    (the round-5 "8x PCG regression", tools/tpu_r5_stage{1..5}.py).
    ``DIAOperator.prepare`` hoists dense row views of the flat panel
    out of the loop; this maps it over any pytree (PC states hold DIA
    level operators). Non-DIA leaves and callables pass through."""
    from kryst_tpu.ops.dia import DIAOperator

    def _is_dia(x):
        return isinstance(x, DIAOperator)

    if tree is None:
        return None
    if _is_dia(tree):
        return tree.prepare()
    try:
        return jax.tree_util.tree_map(
            lambda x: x.prepare() if _is_dia(x) else x, tree, is_leaf=_is_dia
        )
    except Exception:
        return tree  # not a pytree (e.g. a bare callable PC): unchanged


def default_x0(b, x0):
    return jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)


def safe_div(num, den):
    """num/den with 0/0 -> 0 and x/0 -> 0 (breakdown handled by flags)."""
    return jnp.where(den != 0, num / jnp.where(den != 0, den, 1), jnp.zeros_like(num))


def use_true_residual(flag, dtype) -> bool:
    """Resolve the ``true_residual`` option: ``None`` means auto — ON below
    f64, where the recursive residual can claim convergence the true
    residual misses by orders of magnitude (it floors at ~eps*kappa)."""
    if flag is None:
        import jax.numpy as jnp

        return jnp.dtype(dtype) != jnp.float64
    return bool(flag)
