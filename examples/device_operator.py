"""Example: device-born operators — no host assembly, no upload.

For constant-coefficient stencil problems (Poisson, convection-diffusion
on a uniform grid) the operator panels are pure index arithmetic, so
they can be written straight into device HBM by one small compiled
graph instead of being assembled in host memory and shipped across the
interconnect. At 8M dof this turns minutes of CSR assembly plus a
~340 MB upload into ~1 ms (warm), and the whole geometric-multigrid
setup — coarse operators probed on device too — into under a second.

Run:  python examples/device_operator.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from kryst_tpu.ops.dia import stencil_to_dia
from kryst_tpu.pc.gmg import GMGPC
from kryst_tpu.solvers.cg import pcg


def main():
    on_cpu = jax.default_backend() == "cpu"
    n3 = 48 if on_cpu else 100
    grid = (n3, n3, n3)
    n = n3 ** 3

    # 7-point Poisson built entirely on device: A[i,i]=6, -1 to each
    # existing grid neighbour (Dirichlet truncation at the boundary)
    t0 = time.time()
    A = stencil_to_dia(6.0, -1.0, -1.0, grid, dtype=np.float32)
    jax.block_until_ready(A.data)
    print(f"operator ({n/1e6:.2f}M dof) built on device in "
          f"{time.time()-t0:.2f}s")

    # full device-side GMG setup: level-0 panels were never on the host,
    # and every coarse operator is probed through the V-cycle's own
    # transfer kernels (exact Galerkin, pc/rap_probe.py)
    t0 = time.time()
    M = GMGPC.setup(A, grid, nu_pre=2, nu_post=2, smoother="chebyshev",
                    rap="probe")
    print(f"GMG hierarchy ({len(M.levels) + 1} levels) set up in "
          f"{time.time()-t0:.2f}s — no host RAP, no panel uploads")

    b = jnp.ones(n, jnp.float32)
    solve = jax.jit(lambda A_, b_, M_: pcg(A_, b_, M=M_, tol=1e-5,
                                           maxiter=100))
    x, st = solve(A, b, M)
    r = b - A.matvec(x)
    print(f"pcg+gmg: {int(st.iterations)} iterations, true rel residual "
          f"{float(jnp.linalg.norm(r) / jnp.linalg.norm(b)):.2e}")


if __name__ == "__main__":
    main()
