"""Round-5 stage 11: record the two new first-class 1M metrics on-chip.

bench.py now emits `pcg_jacobi_1M_per_iteration` (the flagship loop the
round-5 layout fix restored — VERDICT r4 weak #1) and
`dia_spmv_1M_per_call` as their own metrics; this tool measures both
with bench.py's exact slope methodology and appends them to the
committed BENCH_TPU.jsonl so the record exists even if the driver's
round-end bench run lands on a wedged relay.

Run: python tools/tpu_r5_stage11.py  (one TPU process at a time!)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

from kryst_tpu import JacobiPC, pcg
from kryst_tpu.matrix import gallery
from kryst_tpu.ops.dia import csr_to_dia
from kryst_tpu.utils.chiprecord import append_chip_record, on_real_tpu

assert on_real_tpu(), "this tool records REAL-CHIP numbers only"
print("devices:", jax.devices())


def sync(v):
    return float(v)


def slope(make, lo, hi, reps=3):
    ts = {}
    for it in (lo, hi):
        fn = make(it)
        fn()  # compile
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        ts[it] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


n3 = 100
n = n3 ** 3
t0 = time.time()
a = gallery.poisson_3d(n3)
A = csr_to_dia(a, dtype=np.float32)
b = jnp.ones(n, dtype=jnp.float32)
M = JacobiPC.setup(A)
print(f"setup {time.time()-t0:.1f}s")

x0 = jnp.asarray(np.random.default_rng(3).standard_normal(n).astype(np.float32))
dt = slope(
    lambda it: (
        lambda f=jax.jit(
            lambda v, it=it: jnp.sum(
                lax.fori_loop(0, it, lambda i, u: A.matvec(u) / 6.0, v)
            )
        ): sync(f(x0))
    ),
    200, 3200,
)
traffic = (A.data.size + 2 * n) * 4
gbs = traffic / dt / 1e9
print(f"DIA SpMV 1M: {dt*1e6:.1f} us -> {gbs:.0f} GB/s effective")
append_chip_record("dia_spmv_1M_per_call", dt * 1e6, "us", gbs / 616.0,
                   source="tpu_r5_stage11")

dt_pcg1 = slope(
    lambda it: (
        lambda f=jax.jit(
            lambda Aa, bb, Mm, it=it: pcg(
                Aa, bb, M=Mm, tol=0.0, maxiter=it, true_residual=False,
            )[1].iterations
        ): sync(f(A, b, M))
    ),
    200, 1400, reps=3,
)
print(f"PCG+Jacobi 1M: {dt_pcg1*1e6:.1f} us/iter (r2 baseline 23.8)")
append_chip_record("pcg_jacobi_1M_per_iteration", dt_pcg1 * 1e6, "us",
                   23.8e-6 / dt_pcg1, source="tpu_r5_stage11")
print("recorded.")
