"""Round-5 stage 12: is the GMRES (m+1, n) basis carry update in-place?

gmres 8M cgs2 measures 5.67 ms/iter vs the 4.51 ms traffic bound and
single-pass cgs 3.70 vs 2.54 — the SAME ~1.16 ms absolute gap, which is
what a ~750 MB/iter hidden buffer pass would cost at 650 GB/s. The
(31, 8M) basis V rides the inner while_loop carry and is updated with
``lax.dynamic_update_index_in_dim``; if XLA does NOT alias the carry
buffer in place (cf. the round-4 finding that scan's stacked-ys output
pays a full buffer pass per step on this backend), each iteration
copies the full 992 MB panel.

Probe: slope-time minimal while_loops at 8M — (a) elementwise only,
(b) + one dynamic row update of a (31, n) carry, (c) + a dynamic row
read, (d) chunked carrier variant (tuple of 4 (8, n) chunks, switch
update). Aliased update ⇒ (b)-(a) ~ 0.1 ms (one 32 MB write + loop
machinery); full copy ⇒ (b)-(a) ~ 1.5 ms.
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
MP1 = 31
CH = 8
NCH = -(-MP1 // CH)  # 4

u0 = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))
V0 = jnp.zeros((MP1, n), jnp.float32)
Vt0 = tuple(jnp.zeros((CH, n), jnp.float32) for _ in range(NCH))


def sync(v):
    return float(v)


def slope(make, lo=30, hi=90, reps=3):
    ts = {}
    for it in (lo, hi):
        fn = make(it)
        fn()
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        ts[it] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


# (a) control: elementwise only
def mk_a(it):
    def body(c):
        u, i = c
        return (u * 1.0001 + 0.1, i + 1)

    f = jax.jit(
        lambda u, it=it: lax.while_loop(
            lambda c: c[1] < it, body, (u, jnp.int32(0))
        )[0].sum()
    )
    return lambda: sync(f(u0))


# (b) + dynamic row update of (31, n) carry
def mk_b(it):
    def body(c):
        V, u, i = c
        u2 = u * 1.0001 + 0.1
        V = lax.dynamic_update_index_in_dim(V, u2, i % MP1, 0)
        return (V, u2, i + 1)

    f = jax.jit(
        lambda V, u, it=it: lax.while_loop(
            lambda c: c[2] < it, body, (V, u, jnp.int32(0))
        )[0][0].sum()
    )
    return lambda: sync(f(V0, u0))


# (c) + dynamic row read too (the GMRES shape: read V[j], write V[j+1])
def mk_c(it):
    def body(c):
        V, u, i = c
        vj = V[i % MP1]
        u2 = u * 1.0001 + vj
        V = lax.dynamic_update_index_in_dim(V, u2, (i + 1) % MP1, 0)
        return (V, u2, i + 1)

    f = jax.jit(
        lambda V, u, it=it: lax.while_loop(
            lambda c: c[2] < it, body, (V, u, jnp.int32(0))
        )[0][0].sum()
    )
    return lambda: sync(f(V0, u0))


# (d) chunked carrier: tuple of (8, n) chunks, lax.switch writes one
def mk_d(it):
    def body(c):
        Vt, u, i = c
        u2 = u * 1.0001 + 0.1
        j = i % MP1
        k = j // CH
        r = j % CH

        def wr(kk):
            def br(Vt=Vt):
                return tuple(
                    lax.dynamic_update_index_in_dim(Vt[q], u2, r, 0)
                    if q == kk else Vt[q]
                    for q in range(NCH)
                )

            return br

        Vt = lax.switch(k, [wr(q) for q in range(NCH)])
        return (Vt, u2, i + 1)

    f = jax.jit(
        lambda Vt, u, it=it: lax.while_loop(
            lambda c: c[2] < it, body, (Vt, u, jnp.int32(0))
        )[0][0][0].sum()
    )
    return lambda: sync(f(Vt0, u0))


for name, mk in [("a_elemwise", mk_a), ("b_rowupdate", mk_b),
                 ("c_rw", mk_c), ("d_chunked", mk_d)]:
    dt = slope(mk)
    print(f"{name}: {dt*1e3:.3f} ms/iter", flush=True)
