"""Real-TPU validation + slope timing for the multi-vector streamed SpMV
kernel (ops/streamed.py::dia_spmv_planned_block, ROADMAP 0b).

Run on relay recovery (see TPU_RECOVERY_RUNBOOK.md):
    nohup python tools/tpu_block_kernel.py > /tmp/blockk.log 2>&1 &

1. Mosaic compile + numerics check vs the XLA block form at 1M dof
   (planned operator, forced streaming) for k in {1, 4, 8}.
2. Slope timing at 8M dof, k=8: block kernel vs per-column streamed
   matvec — expect ~3x for 7-point (panels stream once vs 8x).
"""
import sys, time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    log(f"backend: {jax.default_backend()} {jax.devices()}")
    from kryst_tpu.matrix import gallery
    from kryst_tpu.ops.dia import csr_to_dia, dia_spmv_xla_block
    from kryst_tpu.ops.streamed import dia_spmv_planned_block

    # --- numerics at 1M dof (planned layout, real Mosaic lowering) ---
    a = gallery.poisson_3d(100)
    A = csr_to_dia(a, dtype=np.float32).planned()
    n = a.shape[0]
    rng = np.random.default_rng(0)
    for k in (1, 4, 8):
        X = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
        t0 = time.time()
        Y = np.asarray(
            dia_spmv_planned_block(A.data_blk, A.offsets, X, A.plan)
        )
        log(f"k={k}: kernel ran in {time.time()-t0:.1f}s (incl compile)")
        Yr = np.asarray(dia_spmv_xla_block(A.data, A.offsets, X))
        err = np.abs(Y - Yr).max() / max(np.abs(Yr).max(), 1e-30)
        log(f"k={k}: max rel err vs XLA block form = {err:.2e}")
        assert err < 1e-5, "block kernel numerics mismatch"

    # --- slope timing at 8M, k=8: block kernel vs per-column ---
    a8 = gallery.poisson_3d(200)
    A8 = csr_to_dia(a8, dtype=np.float32)  # planned automatically (beyond VMEM)
    n8 = a8.shape[0]
    X8 = jnp.asarray(rng.standard_normal((n8, 8)).astype(np.float32))

    def slope(f, lo, hi, reps=2):
        ts = {}
        for it in (lo, hi):
            g = jax.jit(
                lambda X, it=it: jax.lax.fori_loop(
                    0, it, lambda t, Xc: f(Xc) * 0.12, X
                )[0, 0]
            )
            float(g(X8))
            best = 1e9
            for _ in range(reps):
                t0 = time.time()
                float(g(X8))
                best = min(best, time.time() - t0)
            ts[it] = best
        return (ts[hi] - ts[lo]) / (hi - lo)

    dt_blk = slope(A8.matvec_block, 8, 24)
    est = ((7 + 2 * 8) * n8 * 4) / 650e9
    log(f"block matvec 8M k=8: {dt_blk*1e3:.2f} ms/call "
        f"(traffic bound ~{est*1e3:.2f} ms)")

    def percol(X):
        return jnp.stack([A8.matvec(X[:, j]) for j in range(8)], axis=1)

    dt_col = slope(percol, 8, 24)
    log(f"per-column path 8M k=8: {dt_col*1e3:.2f} ms/call "
        f"-> block kernel speedup {dt_col/dt_blk:.2f}x")


if __name__ == "__main__":
    main()
