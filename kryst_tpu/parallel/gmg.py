"""Distributed geometric multigrid (sharded V-cycle).

Shards every level of a :class:`~kryst_tpu.pc.gmg.GMGPC` hierarchy over the
mesh by the LEADING grid axis. With the leading dimension divisible by
2·n_shards at every coarsening step, the grid transfers are *entirely
shard-local* (a coarse shard's rows upsample exactly onto the same shard's
fine rows), so the only communication in the V-cycle is:

- the halo exchange inside each level's DIA SpMV (ppermute, already
  provided by :class:`~kryst_tpu.parallel.sharded.HaloDIAOperator`), and
- one small ``all_gather`` at the coarsest level, whose host-f64 explicit
  inverse is replicated.

This makes BASELINE config 4 (multigrid-preconditioned CG) runnable over
the mesh — the missing distributed piece the single-device GMGPC left open
(docs/ROADMAP.md item 1).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import register_dataclass

from kryst_tpu.parallel.mesh import AXIS
from kryst_tpu.parallel.sharded import HaloDIAOperator
from kryst_tpu.pc.gmg import GMGPC, _downsample_sum, _upsample


@dataclasses.dataclass(frozen=True)
class ShardedGMGLevel:
    A: HaloDIAOperator
    inv_diag: Array  # local slice
    fine_local: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    coarse_local: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    p_omega: float = dataclasses.field(metadata=dict(static=True))
    smoothed: bool = dataclasses.field(default=True, metadata=dict(static=True))

    def prolong(self, xc: Array) -> Array:
        v = _upsample(xc, self.coarse_local, self.fine_local)  # shard-local
        if not self.smoothed:
            return v
        return v - self.p_omega * self.inv_diag * self.A.matvec(v)

    def restrict(self, r: Array) -> Array:
        """P^T r; smoothed: P0^T (I - omega A^T D^-1) r — the exact
        transpose of ``prolong`` for NONSYMMETRIC A too (Petrov-Galerkin
        consistency, mirroring the single-device fix in pc/gmg.py)."""
        if not self.smoothed:
            return _downsample_sum(r, self.coarse_local, self.fine_local)
        v = r - self.p_omega * self.A.rmatvec(self.inv_diag * r)
        return _downsample_sum(v, self.coarse_local, self.fine_local)


register_dataclass(
    ShardedGMGLevel,
    data_fields=["A", "inv_diag"],
    meta_fields=["fine_local", "coarse_local", "p_omega", "smoothed"],
)


@dataclasses.dataclass(frozen=True)
class ShardedGMGPC:
    levels: Tuple[ShardedGMGLevel, ...]
    coarse_inv: Array  # replicated (nc, nc)
    nc_local: int = dataclasses.field(metadata=dict(static=True))
    nu_pre: int = dataclasses.field(metadata=dict(static=True))
    nu_post: int = dataclasses.field(metadata=dict(static=True))
    smooth_omega: float = dataclasses.field(metadata=dict(static=True))
    axis_name: str = dataclasses.field(default=AXIS, metadata=dict(static=True))
    # Chebyshev weight schedules inherited from the host GMGPC (see
    # pc/gmg.py chebyshev_omegas); pre in root order, post reversed
    smoother: str = dataclasses.field(
        default="jacobi", metadata=dict(static=True)
    )
    cheb_pre: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    cheb_post: tuple = dataclasses.field(default=(), metadata=dict(static=True))

    def partition_spec(self, axis: str):
        """Shardings for sharded_solve: DIA planes split on their last dim,
        local vectors on the axis, the coarse inverse replicated."""
        specs_levels = tuple(
            ShardedGMGLevel(
                A=HaloDIAOperator(
                    data=P(None, axis), offsets=l.A.offsets, halo=l.A.halo,
                    n_shards=l.A.n_shards, axis_name=l.A.axis_name,
                ),
                inv_diag=P(axis),
                fine_local=l.fine_local,
                coarse_local=l.coarse_local,
                p_omega=l.p_omega,
                smoothed=l.smoothed,
            )
            for l in self.levels
        )
        return ShardedGMGPC(
            levels=specs_levels, coarse_inv=P(), nc_local=self.nc_local,
            nu_pre=self.nu_pre, nu_post=self.nu_post,
            smooth_omega=self.smooth_omega, axis_name=self.axis_name,
            smoother=self.smoother, cheb_pre=self.cheb_pre,
            cheb_post=self.cheb_post,
        )

    def _omegas(self, l: int, nu: int, post: bool):
        from kryst_tpu.pc.gmg import smoothing_omegas

        return smoothing_omegas(
            self.smoother, self.smooth_omega, self.cheb_pre,
            self.cheb_post, l, nu, post,
        )

    def _smooth(self, l: int, z: Array, r: Array, nu: int,
                post: bool = False) -> Array:
        lvl = self.levels[l]
        for om in self._omegas(l, nu, post):
            z = z + om * lvl.inv_diag * (r - lvl.A.matvec(z))
        return z

    def _coarse_solve(self, r_local: Array) -> Array:
        # gather the (tiny) coarsest residual, apply the replicated inverse,
        # keep the local slice
        r_full = lax.all_gather(r_local, self.axis_name).reshape(-1)
        z_full = jnp.dot(
            self.coarse_inv, r_full, precision=lax.Precision.HIGHEST
        )
        rank = lax.axis_index(self.axis_name)
        return lax.dynamic_slice(z_full, (rank * self.nc_local,), (self.nc_local,))

    def _vcycle(self, l: int, r: Array) -> Array:
        if l == len(self.levels):
            return self._coarse_solve(r)
        lvl = self.levels[l]
        z = self._smooth(l, jnp.zeros_like(r), r, self.nu_pre)
        resid = r - lvl.A.matvec(z)
        zc = self._vcycle(l + 1, lvl.restrict(resid))
        z = z + lvl.prolong(zc)
        return self._smooth(l, z, r, self.nu_post, post=True)

    def apply(self, r: Array) -> Array:
        return self._vcycle(0, r)


register_dataclass(
    ShardedGMGPC,
    data_fields=["levels", "coarse_inv"],
    meta_fields=["nc_local", "nu_pre", "nu_post", "smooth_omega", "axis_name",
                 "smoother", "cheb_pre", "cheb_post"],
)


def distribute_gmg(pc: GMGPC, mesh: Mesh, axis: str = AXIS) -> ShardedGMGPC:
    """Shard a GMGPC hierarchy over the mesh's leading grid axis.

    Requires every level's leading grid dim to be divisible by the shard
    count and even down to the coarsest transfer (build the GMGPC with
    grid dims of the form n_shards * 2^L * k)."""
    nd = mesh.shape[axis]
    levels = []
    agglomerated = None
    for l in pc.levels:
        f0, c0 = l.fine[0], l.coarse[0]
        if f0 % nd or f0 != 2 * c0:
            raise ValueError(
                f"level grid {l.fine}->{l.coarse}: leading dims must be "
                f"divisible by n_shards={nd} with exact halving; "
                "choose grid dims = n_shards * 2^levels * k"
            )
        n = l.A.n
        halo = max(max(abs(o) for o in l.A.offsets), 1)
        if halo > n // nd or c0 % nd:
            # agglomeration: once a level's stencil halo no longer fits the
            # local block (coarse grids are tiny), stop sharding and solve
            # THIS level with a replicated dense inverse — the standard
            # coarse-grid agglomeration strategy
            dense = np.asarray(l.A.todense(), dtype=np.float64)
            agglomerated = np.linalg.inv(dense).astype(np.asarray(l.A.data).dtype)
            break
        data = jax.device_put(l.A.data, NamedSharding(mesh, P(None, axis)))
        levels.append(
            ShardedGMGLevel(
                A=HaloDIAOperator(
                    data=data, offsets=l.A.offsets, halo=halo,
                    n_shards=nd, axis_name=axis,
                ),
                inv_diag=jax.device_put(l.inv_diag, NamedSharding(mesh, P(axis))),
                fine_local=(l.fine[0] // nd,) + tuple(l.fine[1:]),
                coarse_local=(l.coarse[0] // nd,) + tuple(l.coarse[1:]),
                p_omega=l.p_omega,
                smoothed=l.smoothed,
            )
        )
    if not levels:
        raise ValueError("no level satisfies the sharding constraints")
    coarse_mat = agglomerated if agglomerated is not None else np.asarray(pc.coarse_inv)
    nc = coarse_mat.shape[0]
    if nc % nd:
        raise ValueError(f"coarsest size {nc} not divisible by {nd} shards")
    coarse_inv = jax.device_put(jnp.asarray(coarse_mat), NamedSharding(mesh, P()))
    nlev = len(levels)
    return ShardedGMGPC(
        levels=tuple(levels),
        coarse_inv=coarse_inv,
        nc_local=nc // nd,
        nu_pre=pc.nu_pre,
        nu_post=pc.nu_post,
        smooth_omega=pc.smooth_omega,
        axis_name=axis,
        smoother=pc.smoother,
        cheb_pre=tuple(pc.cheb_pre[:nlev]),
        cheb_post=tuple(pc.cheb_post[:nlev]),
    )
