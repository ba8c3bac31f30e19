"""Round-5 stage 12c: does an UNROLLED Arnoldi cycle with SSA rows hit
the active-prefix traffic bound?

Stage 12/12b: a (31, 8M) panel in a while_loop carry pays a ~1 GB copy
per dynamic row update (1.14 ms/iter), and a Pallas aliased row-writer
is 6x worse (aliasing does not survive the carry on this backend). The
escape: restart m is STATIC, so the inner cycle can be statically
unrolled with basis rows as SSA values — no panel, no carry, no copies.
The one open question is whether XLA fuses the j+1 independent dots
v_i·w (shared operand w) into one pass; if yes the cycle's traffic is
exactly the active-prefix bound (reads j+1 rows + w per pass).

Measures a 30-step unrolled CGS-shaped cycle (1 projection pass + 1
correction pass per step) inside an outer while_loop, slope over cycle
count. Fused-traffic estimate ~1.7 ms/iter at 650 GB/s; unfused dots
add ~0.7; the current while-loop production path pays bound + 1.16.
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

print("devices:", jax.devices())

n = 8_000_000
M = 30

u0 = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))


def sync(v):
    return float(v)


def cycle(u):
    v = [u]
    for j in range(M):
        w = v[j] * 1.0001 + 0.1  # stand-in for the matvec
        hs = [jnp.dot(vi, w) for vi in v]  # j+1 dots sharing w
        corr = hs[0] * v[0]
        for hi, vi in zip(hs[1:], v[1:]):
            corr = corr + hi * vi
        w = w - 1e-9 * corr
        v.append(w)
    return v[-1]


def mk(ncyc):
    def body(c):
        u, i = c
        return (cycle(u), i + 1)

    f = jax.jit(
        lambda u, ncyc=ncyc: lax.while_loop(
            lambda c: c[1] < ncyc, body, (u, jnp.int32(0))
        )[0].sum()
    )
    return lambda: sync(f(u0))


ts = {}
for ncyc in (2, 6):
    fn = mk(ncyc)
    t0 = time.time()
    fn()
    print(f"compile+run ncyc={ncyc}: {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    ts[ncyc] = best
dt = (ts[6] - ts[2]) / 4 / M
print(f"unrolled SSA cycle: {dt*1e3:.3f} ms/iter "
      f"(fused-bound ~1.7, unfused ~2.4, while-loop prod path ~bound+1.16)",
      flush=True)
