"""Example: distributed solve over a device mesh.

Run on any machine (virtual CPU mesh):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/distributed.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

# default to the virtual CPU mesh; set KRYST_DIST_TPU=1 on a real multi-chip
# TPU slice (probing the backend first would initialize it and pin us to a
# single-chip TPU on dev boxes)
if os.environ.get("KRYST_DIST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    # f64 on the CPU mesh: an f32 solve at 64^2 stalls at its eps*kappa
    # floor (~2e-4) before reaching tol=1e-6 (see docs/TUNING.md §2)
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from kryst_tpu import pcg
from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import csr_to_dia
from kryst_tpu.parallel.mesh import solver_mesh
from kryst_tpu.parallel.sharded import (
    distribute_dia,
    pad_vector,
    shard_schwarz,
    sharded_solve,
)


nd = min(8, jax.device_count())
mesh = solver_mesh(nd)
a = gallery.poisson_2d(64)
A = csr_to_dia(a)
Ad, n_padded = distribute_dia(A, mesh)  # block rows + ppermute halo
b = pad_vector(jnp.ones(a.shape[0]), n_padded, mesh)

# PCG + per-shard additive Schwarz (for the single-psum pipelined variant
# swap in `pipecg` — it trades ~sqrt(eps) residual drift for the fused
# reduction, so pair it with f64 or looser tolerances)
M = shard_schwarz(Ad, degree=6)
x, stats = sharded_solve(pcg, Ad, b, mesh=mesh, M=M, tol=1e-6, maxiter=500)
print(
    f"devices={nd} iters={int(stats.iterations)} "
    f"rel={float(stats.rel_residual):.2e} converged={bool(stats.reached_tol)}"
)
