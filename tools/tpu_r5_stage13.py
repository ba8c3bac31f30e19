"""Round-5 stage 13: fully device-side 8M GMG setup.

VERDICT r4 item 5 asked for warm 8M setup < 10 s; stage 9 got it to
23.9 s with the remaining wall being L0 host assembly + the ~340 MB
panel upload + the L0 probe execute. This stage removes the first two:
`stencil_to_dia` builds the L0 panels (and the pre-blocked streaming
layout) ON DEVICE from one small compiled graph, and GMGPC.setup now
accepts the device-born operator directly (rap="probe" end to end — no
host CSR anywhere on the setup path).

Measures (on chip):
  1. stencil_to_dia 8M build wall (cold compile then warm)
  2. GMGPC.setup(device op, rap="probe") wall, twice in-process
  3. correctness: V-cycle apply vs the committed CSR-path hierarchy —
     refined solve to TRUE 1e-8 with the device-built f64 outer operator
     (host scipy true-residual check at the end)

Run: nohup python tools/tpu_r5_stage13.py > /tmp/r5_stage13.log 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_enable_x64", True)

from kryst_tpu.ops.dia import stencil_to_dia  # noqa: E402
from kryst_tpu.pc.gmg import GMGPC  # noqa: E402
from kryst_tpu.solvers.cg import pcg  # noqa: E402
from kryst_tpu.solvers.refine import refine_device  # noqa: E402
from kryst_tpu.utils.chiprecord import append_chip_record  # noqa: E402


def rec(metric, value, unit, vs=None):
    print(f"RESULT {metric}: {value:.4f} {unit}", flush=True)
    append_chip_record(metric, value, unit, vs, source="tpu_r5_stage13")


def main():
    print("devices:", jax.devices(), flush=True)
    G = (200, 200, 200)
    n8 = 200 ** 3

    t0 = time.time()
    A8 = stencil_to_dia(6.0, -1.0, -1.0, G, dtype=np.float32)
    jax.block_until_ready(A8.data_blk)
    t_cold = time.time() - t0
    print(f"stencil_to_dia 8M cold (incl compile): {t_cold:.1f}s", flush=True)

    t0 = time.time()
    A8b = stencil_to_dia(6.0, -1.0, -1.0, G, dtype=np.float32)
    jax.block_until_ready(A8b.data_blk)
    t_warm = time.time() - t0
    rec("stencil_to_dia_8M_build_warm", t_warm, "s")
    del A8b

    # full device-side GMG setup, twice in-process (second shows the
    # pure-execute floor once every probe graph is loaded)
    t0 = time.time()
    pc8 = GMGPC.setup(
        A8, grid=G, nu_pre=2, nu_post=2, dtype=np.float32,
        smoother="chebyshev", coeff_dtype=jnp.bfloat16, rap="probe",
    )
    t_setup1 = time.time() - t0
    print(f"GMG 8M device setup #1: {t_setup1:.1f}s", flush=True)

    t0 = time.time()
    pc8 = GMGPC.setup(
        A8, grid=G, nu_pre=2, nu_post=2, dtype=np.float32,
        smoother="chebyshev", coeff_dtype=jnp.bfloat16, rap="probe",
    )
    t_setup2 = time.time() - t0
    rec("gmg_8M_setup_device_wall_warm", t_setup2, "s")
    # total device-side time-to-hierarchy from nothing (operator + setup)
    rec("gmg_8M_setup_device_total_warm", t_warm + t_setup2, "s")

    # correctness: refined solve to TRUE rtol<=1e-8 with the device f64
    # outer twin, verified on the host against scipy at the end
    A8_64 = stencil_to_dia(6.0, -1.0, -1.0, G, dtype=np.float64)
    b64 = jnp.asarray(np.ones(n8))
    ref8 = jax.jit(
        lambda A64_, A_, M_, bb: refine_device(
            A64_, bb,
            lambda r: pcg(A_, r, M=M_, tol=1e-5, maxiter=60,
                          true_residual=False),
            tol=1e-8, max_outer=6,
        )
    )
    t0 = time.time()
    xr8, st8 = ref8(A8_64, A8, pc8, b64)
    jax.block_until_ready(xr8)
    print(f"refined solve #1 (incl compile): {time.time()-t0:.1f}s",
          flush=True)
    t0 = time.time()
    xr8, st8 = ref8(A8_64, A8, pc8, b64)
    jax.block_until_ready(xr8)
    t_solve = time.time() - t0
    print(f"refined solve #2: {t_solve*1e3:.0f} ms "
          f"(outer={int(st8.outer_iterations)})", flush=True)

    from kryst_tpu.matrix import gallery
    import scipy.sparse as sp

    a8 = gallery.poisson_3d(200)
    a8_sp = sp.csr_matrix(
        (a8.data.astype(np.float64), a8.indices, a8.indptr), shape=a8.shape
    )
    host_rel = float(
        np.linalg.norm(np.asarray(b64) - a8_sp @ np.asarray(xr8))
        / np.linalg.norm(np.asarray(b64))
    )
    print(f"host true rel residual: {host_rel:.2e}", flush=True)
    assert host_rel <= 1e-8, host_rel
    rec("config4_8M_refined_device_setup_TRUE_rtol1e-8", t_solve, "s",
        8.0 / t_solve)


if __name__ == "__main__":
    main()
