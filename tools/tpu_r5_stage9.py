"""Round-5 stage 9: 8M GMG probe-setup wall decomposition (VERDICT item
5: warm < 10 s, cold < 60 s). Runs setup twice in-process (cold-ish then
warm) with KRYST_TPU_SETUP_TRACE=1 phase timing.

Run: KRYST_TPU_SETUP_TRACE=1 nohup python tools/tpu_r5_stage9.py > /tmp/r5_stage9.log 2>&1 &
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kryst_tpu.matrix import gallery  # noqa: E402
from kryst_tpu.pc.gmg import GMGPC  # noqa: E402
from kryst_tpu.utils.chiprecord import append_chip_record  # noqa: E402


def main():
    print(f"devices: {jax.devices()}", flush=True)
    n3 = 200
    t0 = time.time()
    a = gallery.poisson_3d(n3)
    t_asm = time.time() - t0
    print(f"assembly {t_asm:.1f}s", flush=True)

    for label in ("first", "second"):
        t0 = time.time()
        pc = GMGPC.setup(
            a, grid=(n3, n3, n3), nu_pre=2, nu_post=2, dtype=np.float32,
            smoother="chebyshev", symmetric=True, rap="probe",
            coeff_dtype=jnp.bfloat16,
        )
        w = time.time() - t0
        print(f"RESULT gmg_setup_8M_probe_{label}: {w:.1f} s", flush=True)
        append_chip_record(
            f"gmg_setup_8M_probe_{label}", w, "s", 10.0 / w,
            source="tpu_r5_stage9",
        )
        # sanity: one V-cycle executes
        r = jnp.ones(n3 ** 3, jnp.float32)
        z = jax.jit(lambda pc_, r_: pc_.apply(r_))(pc, r)
        print(f"  vcycle ok, |z|={float(jnp.linalg.norm(z)):.3e}", flush=True)
        del pc, z


if __name__ == "__main__":
    main()
