"""Sharded operators and distributed solves.

The reference's distributed story is a ``Comm`` trait whose MPI impl has a
placeholder ``parallel_mat_vec`` (mpi_comm.rs:133-144 is a serial TODO);
here the distributed SpMV is real: a block-row DIA operator whose halo
exchange is a pair of ``lax.ppermute`` neighbor shifts over the mesh axis
(ICI), and whose interior work is the same shifted-slice arithmetic as the
single-device path. Reductions ride ``lax.psum`` via the ``axis_name``
parameter every solver already takes — the ``DistributedInnerProduct``
analogue (reference src/core/wrappers.rs:134-156).

Usage:

    mesh = solver_mesh(8)
    Ad = distribute_dia(A, mesh)                  # device placement
    x, stats = sharded_solve(pcg, Ad, b, mesh=mesh, M=jacobi, tol=1e-8)

The whole Krylov iteration — matvecs, halo exchanges, fused dot psums,
convergence control — runs inside ONE ``shard_map``-ed ``lax.while_loop``;
XLA schedules the collectives (the compiler-era version of the reference's
pipelined non-blocking all-reduce ambitions, pca_gmres.rs:181-204).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array, lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import register_dataclass

from kryst_tpu.ops.dia import DIAOperator
from kryst_tpu.parallel.mesh import AXIS, solver_mesh


@dataclasses.dataclass(frozen=True)
class HaloDIAOperator:
    """Block-row-distributed DIA operator (lives inside shard_map).

    ``data`` is the LOCAL (ndiag, n_local) coefficient block; ``halo`` is
    the maximum |offset| — the width of the neighbor exchange. Global
    boundary halos arrive as zeros (non-circular ppermute), matching the
    zero coefficients DIA stores out of range.
    """

    data: Array
    offsets: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    halo: int = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(default=1, metadata=dict(static=True))
    axis_name: str = dataclasses.field(default=AXIS, metadata=dict(static=True))

    @property
    def dtype(self):
        return self.data.dtype

    def _extend(self, x: Array) -> Array:
        """Halo-extend a local vector: neighbor edges arrive via a ppermute
        pair over ICI; global boundary halos are zeros (non-circular
        ppermute), matching the zero coefficients DIA stores out of range.
        (parallel_mat_vec done properly — cf. mpi_comm.rs:133-144's TODO.)"""
        h = self.halo
        n_local = x.shape[-1]
        size = self.n_shards
        right_edge = x[..., n_local - h :]
        left_edge = x[..., :h]
        from_left = lax.ppermute(
            right_edge, self.axis_name, [(i, i + 1) for i in range(size - 1)]
        )
        from_right = lax.ppermute(
            left_edge, self.axis_name, [(i + 1, i) for i in range(size - 1)]
        )
        return jnp.concatenate([from_left, x, from_right], axis=-1)

    def matvec(self, x: Array) -> Array:
        h = self.halo
        n_local = x.shape[0]
        xext = self._extend(x)
        acc = jnp.zeros_like(x)
        for k, off in enumerate(self.offsets):
            acc = acc + self.data[k] * lax.dynamic_slice(
                xext, (h + off,), (n_local,)
            )
        return acc

    def rmatvec(self, x: Array) -> Array:
        """A^T x with the mirror-image halo pattern.

        Row-major DIA stores A[j, j+off] = data[k, j], so
        (A^T x)_i = sum_k data[k, i-off_k] * x[i-off_k]: form the halo-
        EXTENDED elementwise products data_ext * x_ext once, then read them
        back with shift -off. The data-plane edges ride the same ppermute
        pair as the vector edges (one extra small (ndiag, halo) transfer)."""
        h = self.halo
        n_local = x.shape[0]
        xext = self._extend(x)
        dext = self._extend(self.data)
        prod = dext * xext[None, :]
        acc = jnp.zeros_like(x)
        for k, off in enumerate(self.offsets):
            acc = acc + lax.dynamic_slice(
                prod[k], (h - off,), (n_local,)
            )
        return acc

    def diagonal(self) -> Array:
        if 0 in self.offsets:
            return self.data[self.offsets.index(0)]
        return jnp.zeros(self.data.shape[1], dtype=self.data.dtype)


register_dataclass(
    HaloDIAOperator,
    data_fields=["data"],
    meta_fields=["offsets", "halo", "n_shards", "axis_name"],
)


def distribute_dia(
    A: DIAOperator, mesh: Mesh, axis: str = AXIS
) -> Tuple[HaloDIAOperator, int]:
    """Shard a DIAOperator's coefficient planes by rows over the mesh.

    Returns ``(halo_op, n_padded)``: rows are zero-padded to a multiple of
    the mesh size (padded rows have zero coefficients and solve to zero).
    """
    nd = mesh.shape[axis]
    n = A.n
    n_pad = (-n) % nd
    data = jnp.pad(A.data, ((0, 0), (0, n_pad)))
    if n_pad and 0 in A.offsets:
        # keep the padded block nonsingular for Jacobi-style PCs
        k0 = A.offsets.index(0)
        data = data.at[k0, n:].set(1.0)
    halo = max(max(abs(o) for o in A.offsets), 1)
    if halo > (n + n_pad) // nd:
        raise ValueError(
            f"halo {halo} exceeds local block {(n + n_pad) // nd}; "
            "use fewer shards or a narrower-band operator"
        )
    data = jax.device_put(data, NamedSharding(mesh, P(None, axis)))
    return (
        HaloDIAOperator(
            data=data, offsets=A.offsets, halo=halo, n_shards=nd, axis_name=axis
        ),
        n + n_pad,
    )


def pad_vector(b: Array, n_padded: int, mesh: Mesh, axis: str = AXIS) -> Array:
    b = jnp.pad(jnp.asarray(b), (0, n_padded - b.shape[0]))
    return jax.device_put(b, NamedSharding(mesh, P(axis)))


@dataclasses.dataclass(frozen=True)
class ShardSchwarzPC:
    """Additive-Schwarz preconditioner with one subdomain per shard.

    Inside shard_map each device applies a local solve on its diagonal
    block (cross-shard couplings are cut — the classic non-overlapping ASM
    / block-Jacobi-by-ranks decomposition the reference's ASM generalizes,
    asm.rs:45-65). The local solve is a fixed-degree Chebyshev polynomial
    of the local DIA block: matvec-only, gather-free, and identical cost on
    every shard — no per-subdomain factorization padding needed. This is
    the distributed PC of BASELINE config 5 (pipelined CG / CA-GMRES + ASM
    over the mesh).
    """

    data: Array  # local (ndiag, n_local) coefficient planes
    emin: Array
    emax: Array
    offsets: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    degree: int = dataclasses.field(default=8, metadata=dict(static=True))

    def _local_matvec(self, v: Array) -> Array:
        from kryst_tpu.ops.dia import dia_spmv_xla

        # zero-padded shifted slices = Dirichlet cut at shard boundaries
        return dia_spmv_xla(self.data, self.offsets, v)

    def apply(self, r: Array) -> Array:
        from kryst_tpu.pc.chebyshev import chebyshev_apply

        return chebyshev_apply(
            self._local_matvec, r, self.emin, self.emax, self.degree
        )


register_dataclass(
    ShardSchwarzPC,
    data_fields=["data", "emin", "emax"],
    meta_fields=["offsets", "degree"],
)


def shard_schwarz(
    A: HaloDIAOperator, degree: int = 8, emin=None, emax=None
) -> ShardSchwarzPC:
    """Build the per-shard ASM PC from a distributed operator. Spectrum
    bounds default to Gershgorin estimates of the global operator (valid
    for every diagonal sub-block)."""
    if emax is None:
        radius = jnp.sum(jnp.abs(A.data), axis=0).max()
        emax = 1.05 * radius
    if emin is None:
        emin = emax / 30.0
    return ShardSchwarzPC(
        data=A.data,
        emin=jnp.asarray(emin, A.data.dtype),
        emax=jnp.asarray(emax, A.data.dtype),
        offsets=A.offsets,
        degree=degree,
    )


def _m_specs(M, axis: str):
    """Partition specs for a PC pytree. PCs with bespoke layouts implement
    ``partition_spec(axis)`` (e.g. the sharded multigrid, whose coarse
    inverse is replicated); otherwise by leaf rank: 1-D leaves shard on the
    axis, 2-D leaves (coefficient planes) shard their last dim, scalars
    replicate."""
    import jax.tree_util as jtu

    if hasattr(M, "partition_spec"):
        return M.partition_spec(axis)

    def spec(leaf):
        nd = getattr(leaf, "ndim", 0)
        if nd == 1:
            return P(axis)
        if nd == 2:
            return P(None, axis)
        return P()

    return jtu.tree_map(spec, M)


def sharded_solve(
    solver_fn,
    A: HaloDIAOperator,
    b: Array,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = AXIS,
    M=None,
    **solver_kw,
):
    """Run ``solver_fn`` (cg/pcg/pipecg/gmres/... — anything taking
    ``axis_name``) inside one shard_map over the mesh.

    ``M`` must be built from sharded arrays (e.g. JacobiPC from the
    distributed diagonal) or be None.
    """
    mesh = mesh or solver_mesh()

    # inside shard_map the solver sees only the LOCAL rows, so its
    # "maxiter = n" default would silently cap iterations at n/n_shards —
    # pin the default to the GLOBAL size here
    solver_kw.setdefault("maxiter", int(b.shape[0]))

    in_specs = (P(None, axis), P(axis), _m_specs(M, axis) if M is not None else P())
    m_arg = M if M is not None else jnp.zeros((), dtype=b.dtype)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(axis), P()),
    )
    def run(a_data, b_local, m_local):
        A_local = HaloDIAOperator(
            data=a_data, offsets=A.offsets, halo=A.halo,
            n_shards=A.n_shards, axis_name=axis,
        )
        M_local = m_local if M is not None else None
        if M_local is not None:
            x, stats = solver_fn(
                A_local, b_local, M=M_local, axis_name=axis, **solver_kw
            )
        else:
            x, stats = solver_fn(A_local, b_local, axis_name=axis, **solver_kw)
        return x, stats

    return run(A.data, b, m_arg)


# ---------------------------------------------------------------------------
# 2-D mesh: block rows x diagonal planes (docs/ROADMAP.md item 4)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class HaloDIA2DOperator:
    """DIA operator distributed over a 2-D mesh: rows block-sharded on
    ``axis_name`` (halo ppermutes over fast ICI links), coefficient PLANES
    sharded on ``plane_axis`` (each plane-rank computes a partial SpMV over
    its diagonals; one psum over the plane axis combines them).

    Because the SAME program runs on every shard while different plane
    ranks hold different diagonals, offsets are carried as DATA (an int32
    vector sharded on the plane axis) and each term is a
    ``lax.dynamic_slice`` of the halo-extended vector at a traced start —
    still contiguous, still gather-free. ``halo`` is the global max
    |offset| (static).

    When it pays: many-diagonal operators (RCM-banded matrices, AMG coarse
    levels with 100+ planes), where splitting coefficient-plane HBM traffic
    n_planes-ways outweighs one vector psum. For a 7-point stencil the
    psum costs more than the 7 planes — use the 1-D mesh there.
    """

    data: Array  # local (planes_local, n_local)
    offs: Array  # local (planes_local,) int32
    halo: int = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    axis_name: str = dataclasses.field(default=AXIS, metadata=dict(static=True))
    plane_axis: str = dataclasses.field(default="planes", metadata=dict(static=True))

    @property
    def dtype(self):
        return self.data.dtype

    def _extend(self, x: Array) -> Array:
        h = self.halo
        n_local = x.shape[-1]
        size = self.n_shards
        right_edge = x[..., n_local - h :]
        left_edge = x[..., :h]
        from_left = lax.ppermute(
            right_edge, self.axis_name, [(i, i + 1) for i in range(size - 1)]
        )
        from_right = lax.ppermute(
            left_edge, self.axis_name, [(i + 1, i) for i in range(size - 1)]
        )
        return jnp.concatenate([from_left, x, from_right], axis=-1)

    def matvec(self, x: Array) -> Array:
        h = self.halo
        n_local = x.shape[0]
        xext = self._extend(x)
        acc = jnp.zeros_like(x)
        for k in range(self.data.shape[0]):  # static local plane count
            acc = acc + self.data[k] * lax.dynamic_slice(
                xext, (h + self.offs[k],), (n_local,)
            )
        return lax.psum(acc, self.plane_axis)

    def rmatvec(self, x: Array) -> Array:
        h = self.halo
        n_local = x.shape[0]
        xext = self._extend(x)
        dext = self._extend(self.data)
        prod = dext * xext[None, :]
        acc = jnp.zeros_like(x)
        for k in range(self.data.shape[0]):
            acc = acc + lax.dynamic_slice(
                prod[k], (h - self.offs[k],), (n_local,)
            )
        return lax.psum(acc, self.plane_axis)

    def diagonal(self) -> Array:
        contrib = jnp.sum(
            jnp.where((self.offs == 0)[:, None], self.data, 0.0), axis=0
        )
        return lax.psum(contrib, self.plane_axis)


register_dataclass(
    HaloDIA2DOperator,
    data_fields=["data", "offs"],
    meta_fields=["halo", "n_shards", "axis_name", "plane_axis"],
)


def distribute_dia_2d(
    A: DIAOperator, mesh: Mesh, row_axis: str = AXIS, plane_axis: str = "planes"
) -> Tuple[HaloDIA2DOperator, int]:
    """Shard a DIAOperator over a 2-D mesh: rows blocked on ``row_axis``,
    coefficient planes on ``plane_axis``. Returns ``(op, n_padded)``."""
    nd = mesh.shape[row_axis]
    npl = mesh.shape[plane_axis]
    n = A.n
    n_pad = (-n) % nd
    data = jnp.pad(A.data, ((0, 0), (0, n_pad)))
    if n_pad and 0 in A.offsets:
        k0 = A.offsets.index(0)
        data = data.at[k0, n:].set(1.0)  # nonsingular padded block
    # pad the plane count to a multiple of the plane axis with zero planes
    # (offset 0, zero coefficients — exact no-ops)
    p_pad = (-len(A.offsets)) % npl
    if p_pad:
        data = jnp.pad(data, ((0, p_pad), (0, 0)))
    offs = jnp.asarray(list(A.offsets) + [0] * p_pad, dtype=jnp.int32)
    halo = max(max(abs(o) for o in A.offsets), 1)
    if halo > (n + n_pad) // nd:
        raise ValueError(
            f"halo {halo} exceeds local block {(n + n_pad) // nd}; "
            "use fewer row shards or a narrower-band operator"
        )
    data = jax.device_put(data, NamedSharding(mesh, P(plane_axis, row_axis)))
    offs = jax.device_put(offs, NamedSharding(mesh, P(plane_axis)))
    return (
        HaloDIA2DOperator(
            data=data, offs=offs, halo=halo, n_shards=nd,
            axis_name=row_axis, plane_axis=plane_axis,
        ),
        n + n_pad,
    )


def sharded_solve_2d(
    solver_fn,
    A: HaloDIA2DOperator,
    b: Array,
    *,
    mesh: Mesh,
    M=None,
    **solver_kw,
):
    """Run a solver over the 2-D mesh: vectors are row-sharded and
    replicated over the plane axis (every plane-rank runs the identical
    vector recurrence; the matvec's plane-psum keeps them in lockstep).
    Dots psum over the ROW axis only."""
    row_axis, plane_axis = A.axis_name, A.plane_axis
    solver_kw.setdefault("maxiter", int(b.shape[0]))
    in_specs = (
        P(plane_axis, row_axis),
        P(plane_axis),
        P(row_axis),
        _m_specs(M, row_axis) if M is not None else P(),
    )
    m_arg = M if M is not None else jnp.zeros((), dtype=b.dtype)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(row_axis), P()),
    )
    def run(a_data, a_offs, b_local, m_local):
        A_local = HaloDIA2DOperator(
            data=a_data, offs=a_offs, halo=A.halo, n_shards=A.n_shards,
            axis_name=row_axis, plane_axis=plane_axis,
        )
        M_local = m_local if M is not None else None
        if M_local is not None:
            x, stats = solver_fn(
                A_local, b_local, M=M_local, axis_name=row_axis, **solver_kw
            )
        else:
            x, stats = solver_fn(A_local, b_local, axis_name=row_axis, **solver_kw)
        return x, stats

    return run(A.data, A.offs, b, m_arg)
