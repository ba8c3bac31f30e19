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


def emit_monitor(monitor, it, res):
    """Per-iteration monitor callback (reference ``monitor`` FnMut(iter,
    res_norm), cg.rs:84-88 / pcg.rs:82-86 / fgmres.rs:93-97). Implemented
    with ``jax.debug.callback`` so it fires from inside jit — ordered,
    host-side, zero effect on the compiled computation."""
    if monitor is not None:
        jax.debug.callback(monitor, it, res, ordered=True)


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
