"""Example: solve a 3-D Poisson problem three ways.

Run:  python examples/poisson.py
(The reference ships one example, examples/; this is its analogue.)
"""
import time
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import subprocess

import jax


def _tpu_responsive(timeout_s: int = 300) -> bool:
    """Probe the TPU relay in a subprocess: a killed remote compile can
    wedge it for hours, and initializing the backend in-process would
    hang this example (see CLAUDE.md)."""
    code = (
        "import jax; "
        "jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache'); "
        "import jax.numpy as jnp; print(float(jnp.sum(jnp.ones(8))))"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


if not _tpu_responsive():
    print("TPU relay unresponsive -> CPU backend")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
if jax.default_backend() == "cpu":
    N = 32
else:
    N = 64

from kryst_tpu import JacobiPC, pcg, solve
from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import csr_to_dia
from kryst_tpu.pc.gmg import GMGPC
from kryst_tpu.solvers.refine import iterative_refinement

a = gallery.poisson_3d(N)  # host CSR assembly
n = N ** 3
b = jnp.ones(n, dtype=jnp.float32)

# 1. one-call API (auto DIA conversion, string PC; grid= turns on exact
#    constant-stencil detection -> the zero-coefficient-traffic matvec)
x, stats = solve(a, b, solver="pcg", pc="jacobi", tol=1e-6, maxiter=2000,
                 grid=(N, N, N))
print(f"[api]      iters={int(stats.iterations)} rel={float(stats.rel_residual):.2e}")

# 2. explicit operator + multigrid, jitted
A = csr_to_dia(a, dtype=np.float32, grid=(N, N, N))
pc = GMGPC.setup(a, grid=(N, N, N), nu_pre=2, nu_post=2, dtype=np.float32)
run = jax.jit(lambda A, b, pc: pcg(A, b, M=pc, tol=1e-6, maxiter=100))
x, stats = run(A, b, pc)
t0 = time.time()
x, stats = run(A, b, pc)
_ = float(np.asarray(x)[0])
print(f"[gmg]      iters={int(stats.iterations)} cached_solve={time.time()-t0:.3f}s")

# 3. mixed-precision refinement: TRUE f64 residual below 1e-10
inner = jax.jit(lambda rhs: pcg(A, rhs, M=pc, tol=1e-5, maxiter=40))
x64, info = iterative_refinement(a, np.ones(n), inner, tol=1e-10)
print(f"[refined]  outer={info['outer_iterations']} true_rel={info['history'][-1]:.2e}")
