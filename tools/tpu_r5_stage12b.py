"""Round-5 stage 12b: can a Pallas row-writer with input_output_aliases
kill the full-panel copy that dynamic_update_index_in_dim pays?

Stage 12 measured: updating one row of a (31, 8M) while_loop-carried
panel costs 1.14 ms/iter (a full ~1 GB buffer copy; elementwise control
0.045) — the exact 1.16 ms/iter gap between measured GMRES 8M and its
traffic bound. Probe (e): write the row through a pallas_call whose
output ALIASES the panel operand and whose grid covers only row j
(scalar-prefetched index) — traffic should be one 32 MB row write.

BlockSpec legality: a (1, BN) block on (31, n) violates the
"second-to-last block dim divisible by 8 or equal to the array dim"
rule, so the panel is VIEWED as (mp1, 1, n) and the block is (1, 1, n)
— both trailing dims equal the array's, one whole-row tile, pure DMA
(needs vmem_limit_bytes raised: the row tile is 32 MB at 8M).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices())

n = 8_000_000
MP1 = 31


def _rw_kernel(jref, row_ref, v_ref, out_ref):
    del jref, v_ref
    out_ref[...] = row_ref[...]


def row_set(V, row, j):
    """V.at[j].set(row) with the output aliased onto V: one row write."""
    mp1, nn = V.shape
    out = pl.pallas_call(
        _rw_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, 1, nn), lambda i, jv: (0, 0, 0)),  # row
                pl.BlockSpec(memory_space=pl.ANY),  # V (aliased, unread)
            ],
            out_specs=pl.BlockSpec((1, 1, nn), lambda i, jv: (jv[0], 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((mp1, 1, nn), V.dtype),
        input_output_aliases={2: 0},  # V operand (after the scalar) -> out
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(
        jnp.atleast_1d(j).astype(jnp.int32),
        row.reshape(1, 1, nn),
        V.reshape(mp1, 1, nn),
    )
    return out.reshape(mp1, nn)


u0 = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))
V0 = jnp.zeros((MP1, n), jnp.float32)

# correctness first (small)
ns = 4096
Vs = jnp.asarray(np.random.default_rng(1).standard_normal((MP1, ns)).astype(np.float32))
rs = jnp.asarray(np.random.default_rng(2).standard_normal(ns).astype(np.float32))

got = jax.jit(lambda V, r: row_set(V, r, jnp.int32(7)))(Vs, rs)
want = Vs.at[7].set(rs)
np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
# and inside a while_loop (the carry path we care about)
def _loopcheck(V, r):
    def body(c):
        V, i = c
        return (row_set(V, r * (i + 1.0), i), i + 1)

    return lax.while_loop(lambda c: c[1] < 5, body, (V, jnp.int32(0)))[0]

got2 = jax.jit(_loopcheck)(Vs, rs)
want2 = Vs
for i in range(5):
    want2 = want2.at[i].set(rs * (i + 1.0))
np.testing.assert_array_equal(np.asarray(got2), np.asarray(want2))
print("correctness: row_set == at[j].set (direct + in-loop)  OK", flush=True)


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


# (e) pallas row write only
def mk_e(it):
    def body(c):
        V, u, i = c
        u2 = u * 1.0001 + 0.1
        V = row_set(V, u2, i % MP1)
        return (V, u2, i + 1)

    f = jax.jit(
        lambda V, u, it=it: lax.while_loop(
            lambda c: c[2] < it, body, (V, u, jnp.int32(0))
        )[0][0].sum()
    )
    return lambda: sync(f(V0, u0))


# (f) + dynamic row read (GMRES shape: read V[j], write V[j+1])
def mk_f(it):
    def body(c):
        V, u, i = c
        vj = V[i % MP1]
        u2 = u * 1.0001 + vj
        V = row_set(V, u2, (i + 1) % MP1)
        return (V, u2, i + 1)

    f = jax.jit(
        lambda V, u, it=it: lax.while_loop(
            lambda c: c[2] < it, body, (V, u, jnp.int32(0))
        )[0][0].sum()
    )
    return lambda: sync(f(V0, u0))


for name, mk in [("e_pallas_write", mk_e), ("f_pallas_rw", mk_f)]:
    dt = slope(mk)
    print(f"{name}: {dt*1e3:.3f} ms/iter", flush=True)
