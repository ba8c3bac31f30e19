"""Example: the sequence-of-solves production pattern.

One LOBPCG eigensolve harvests the near-kernel modes of an SPD operator;
every subsequent right-hand side is then solved with A-DEF2 deflated PCG
(`DeflationPC`) — the coarse correction removes the slow modes, cutting
iterations for the whole sequence at the cost of two tall-skinny MXU
matmuls per application.

Run:  python examples/deflated_sequence.py   (CPU-friendly, ~seconds)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from kryst_tpu import DeflationPC, JacobiPC, pcg
from kryst_tpu.matrix import gallery
from kryst_tpu.solvers.lobpcg import lobpcg


def main():
    n_grid = 48
    n = n_grid * n_grid
    a = gallery.poisson_2d(n_grid)
    A = a.to_dense_operator()
    Mj = JacobiPC.setup(A)
    rng = np.random.default_rng(0)

    # --- one eigensolve up front -----------------------------------
    t0 = time.time()
    X0 = jnp.asarray(rng.standard_normal((n, 8)))
    w, X, est = lobpcg(A, X0, tol=1e-6, maxiter=400)
    print(f"lobpcg: lowest 8 eigenvalues in {int(est.iterations)} its "
          f"({time.time()-t0:.2f}s): {np.array2string(np.asarray(w), precision=4)}")

    Md = DeflationPC.setup(A, X, inner=Mj)

    # --- a sequence of right-hand sides ----------------------------
    plain_total = defl_total = 0
    for i in range(5):
        b = jnp.asarray(rng.standard_normal(n))
        _, st_p = pcg(A, b, M=Mj, tol=1e-10, maxiter=4000)
        _, st_d = pcg(A, b, M=Md, tol=1e-10, maxiter=4000)
        plain_total += int(st_p.iterations)
        defl_total += int(st_d.iterations)
        print(f"rhs {i}: jacobi-pcg {int(st_p.iterations):4d} its | "
              f"deflated {int(st_d.iterations):4d} its")
    print(f"sequence total: {plain_total} -> {defl_total} iterations "
          f"({plain_total / max(defl_total, 1):.2f}x fewer)")


if __name__ == "__main__":
    main()
