"""Device-mesh helpers.

TPU-native replacement for the reference's ``Comm`` trait hierarchy
(src/parallel/mod.rs:4-35, mpi_comm.rs, rayon_comm.rs): rank/size become
``lax.axis_index`` / mesh axis size, ``all_reduce`` becomes ``lax.psum``
over an ICI mesh axis, scatter/gather become shardings. A single-device
mesh reproduces RayonComm's no-op collectives (rayon_comm.rs:76-78)
without any code change — psum over a size-1 axis is the identity.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shards"
PLANE_AXIS = "planes"


def solver_mesh(n_devices: Optional[int] = None, axis: str = AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return jax.make_mesh(
        (n,), (axis,),
        axis_types=(jax.sharding.AxisType.Auto,),
        devices=devs[:n],
    )


def solver_mesh_2d(
    n_rows: int = 4,
    n_planes: int = 2,
    row_axis: str = AXIS,
    plane_axis: str = PLANE_AXIS,
) -> Mesh:
    """2-D mesh: block rows over the FAST (ICI-adjacent, leading) axis so
    halo ppermutes ride neighbor links, diagonal planes over the second
    (slower / DCN-shaped) axis whose only traffic is one psum per matvec
    (docs/ROADMAP.md item 4)."""
    devs = jax.devices()
    n = n_rows * n_planes
    return jax.make_mesh(
        (n_rows, n_planes), (row_axis, plane_axis),
        axis_types=(jax.sharding.AxisType.Auto, jax.sharding.AxisType.Auto),
        devices=devs[:n],
    )


def shard_vector(x, mesh: Mesh, axis: str = AXIS):
    """Place a vector with its leading dim sharded over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def axis_rank(axis: str = AXIS):
    """Rank within the mesh axis (Comm::rank analogue); traced value."""
    return jax.lax.axis_index(axis)


def axis_size_of(mesh: Mesh, axis: str = AXIS) -> int:
    return mesh.shape[axis]
