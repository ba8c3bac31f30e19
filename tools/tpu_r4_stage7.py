"""Round-4 stage 7: device-side probe RAP (pc/rap_probe.py) on the chip.

Drives GMGPC.setup(rap="probe") end-to-end through the public API at 1M
and 8M dof and compares against rap="host":
  - setup WALL (the VERDICT r3 item-5 target: host was 71-93 s at 8M);
  - V-cycle apply agreement on a random vector;
  - refined-solve iteration parity + TRUE residual.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import csr_to_dia
from kryst_tpu.pc.gmg import GMGPC
from kryst_tpu.solvers.gmres import gmres
from kryst_tpu.solvers.refine import refine_device

print("backend:", jax.default_backend(), jax.devices(), flush=True)


def refined(a, A64, A, pc, n):
    inner = lambda Ai, r, M: gmres(
        Ai, r, M=M, side="right", tol=1e-5, maxiter=200, restart=30
    )
    f = jax.jit(
        lambda A64, A, M, b64: refine_device(
            A64, b64, lambda r: inner(A, r, M), tol=1e-8, max_outer=6
        )
    )
    b64 = jnp.ones(n)
    x, st = f(A64, A, pc, b64)
    t0 = time.time()
    x, st = f(A64, A, pc, b64)
    float(st.outer_iterations)
    wall = time.time() - t0
    import scipy.sparse as sp
    a_sp = sp.csr_matrix(
        (a.data.astype(np.float64), a.indices, a.indptr), shape=a.shape
    )
    host_rel = float(
        np.linalg.norm(np.ones(n) - a_sp @ np.asarray(x))
        / np.linalg.norm(np.ones(n))
    )
    return wall, int(st.outer_iterations), int(st.inner_iterations), host_rel


for n3 in (100, 200):
    n = n3 ** 3
    t0 = time.time()
    a = gallery.poisson_3d(n3)
    print(f"[{n3}^3] CSR assembly {time.time()-t0:.0f}s", flush=True)
    kw = dict(
        grid=(n3,) * 3, nu_pre=2, nu_post=2, dtype=np.float32,
        smoother="chebyshev", coeff_dtype=jnp.bfloat16, symmetric=True,
    )
    t0 = time.time()
    pc_h = GMGPC.setup(a, **kw)
    t_host = time.time() - t0
    t0 = time.time()
    pc_p = GMGPC.setup(a, rap="probe", **kw)
    t_probe = time.time() - t0
    print(
        f"[{n3}^3] GMG setup host {t_host:.1f}s vs PROBE {t_probe:.1f}s "
        f"({t_host/t_probe:.1f}x); levels {len(pc_h.levels)} vs "
        f"{len(pc_p.levels)}", flush=True,
    )
    # second probe setup: compile-cache warm (the steady-state cost)
    t0 = time.time()
    pc_p2 = GMGPC.setup(a, rap="probe", **kw)
    print(f"[{n3}^3] probe setup warm: {time.time()-t0:.1f}s", flush=True)

    r = jnp.asarray(
        np.random.default_rng(1).standard_normal(n).astype(np.float32)
    )
    zh = jax.jit(pc_h.apply)(r)
    zp = jax.jit(pc_p.apply)(r)
    num = float(jnp.linalg.norm(zp - zh) / jnp.linalg.norm(zh))
    print(f"[{n3}^3] V-cycle apply rel diff probe-vs-host: {num:.2e}",
          flush=True)

    t0 = time.time()
    A64 = csr_to_dia(a, dtype=np.float64)
    A = csr_to_dia(a, dtype=np.float32)
    print(f"[{n3}^3] operator build {time.time()-t0:.0f}s", flush=True)
    wh, oh, ih, rh = refined(a, A64, A, pc_h, n)
    wp, op_, ip_, rp = refined(a, A64, A, pc_p, n)
    print(
        f"[{n3}^3] refined host: {wh*1e3:.0f} ms outer={oh} inner={ih} "
        f"rel={rh:.2e} | probe: {wp*1e3:.0f} ms outer={op_} inner={ip_} "
        f"rel={rp:.2e}", flush=True,
    )
    del pc_h, pc_p, pc_p2, A64, A, a, r, zh, zp

print("R4 STAGE 7 DONE", flush=True)
