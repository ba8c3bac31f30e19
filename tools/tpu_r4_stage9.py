"""Round-4 stage 9: validate the dense/cells/ELL/DIA dispatch at scale
(VERDICT r3 item 8 / ROADMAP 7).

Builds the AMG pass-1 hierarchy for (a) a 1M-dof expander Laplacian and
(b) a 1M-node unstructured FEM Poisson matrix, then slope-times each
level's matvec in EVERY buildable format (DIA/RCM-DIA, cells, ELL,
dense) and reports whether the production dispatch picked the fastest.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax import lax

from kryst_tpu.matrix import gallery
from kryst_tpu.matrix.formats import pick_unstructured, scipy_to_ell
from kryst_tpu.ops.cellspmv import cells_if_faster
from kryst_tpu.core.linop import DenseOperator

print("backend:", jax.default_backend(), jax.devices(), flush=True)


def slope(make, lo, hi, reps=2):
    ts = {}
    for it in (lo, hi):
        f = make(it)
        float(f())
        best = 1e9
        for _ in range(reps):
            t1 = time.time()
            float(f())
            best = min(best, time.time() - t1)
        ts[it] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def time_matvec(op, n, lo=50, hi=200):
    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal(n).astype(np.float32)
    )
    scale = jnp.float32(1e-3)

    def mk(it):
        f = jax.jit(
            lambda A, v, it=it: jnp.sum(
                lax.fori_loop(0, it, lambda i, u: A.matvec(u) * scale, v)
            )
        )
        return lambda: f(op, x0)

    return slope(mk, lo, hi)


def hierarchy(a, name, max_levels=10, coarse_size=64):
    from kryst_tpu.pc.amg import (
        _adaptive_theta, _aggregate, _filter_rap, _smoothed_prolongation,
        _to_scipy, _truncate_p,
    )

    A = _to_scipy(a)
    out = []
    for _ in range(max_levels):
        if A.shape[0] <= coarse_size:
            break
        th = _adaptive_theta(A, 0.08)
        agg = _aggregate(A, th)
        nc = int(agg.max()) + 1
        if nc >= max(1, int(0.9 * A.shape[0])):
            break
        P = _smoothed_prolongation(A, agg, 2.0 / 3.0, False)
        p_mean = P.nnz / max(P.shape[0], 1)
        if p_mean > 16:
            P = _truncate_p(P, 0.02, max_per_row=12)
        out.append(A)
        fine_mean = A.nnz / max(A.shape[0], 1)
        A = (P.T.tocsr() @ A @ P).tocsr()
        c_mean = A.nnz / max(A.shape[0], 1)
        if c_mean > max(32.0, 4.0 * fine_mean):
            A = _filter_rap(A, 0.02)
    out.append(A)
    print(f"[{name}] {len(out)} levels: "
          + " ".join(f"{m.shape[0]}({m.nnz//1000}k)" for m in out),
          flush=True)
    return out


def validate(levels, name):
    from kryst_tpu.ops.dia import scipy_to_dia
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    for li, A in enumerate(levels):
        n = A.shape[0]
        if n < 2000:
            print(f"[{name} L{li}] n={n}: dense coarse solve territory, skip",
                  flush=True)
            continue
        cands = {}
        budget = max(32, 64_000_000 // max(n, 1))
        cap = min(512, budget, max(32, n // 4))
        try:
            cands["dia"] = scipy_to_dia(A, max_offsets=cap, dtype=np.float32)
        except ValueError:
            try:
                p = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=False),
                               dtype=np.int64)
                cands["dia_rcm"] = scipy_to_dia(
                    A[p][:, p].tocsr(), max_offsets=cap, dtype=np.float32
                )
            except ValueError:
                pass
        widths = np.diff(A.indptr) if hasattr(A, "indptr") else None
        try:
            cop = cells_if_faster(
                A, ell_width=int(widths.max()), dtype=np.float32,
                transpose="never",
            )
            if cop is not None:
                cands["cells"] = cop
        except Exception as e:
            print(f"  cells failed: {type(e).__name__}: {e}", flush=True)
        if n <= 8192:
            cands["dense"] = DenseOperator(
                jnp.asarray(np.asarray(A.todense(), dtype=np.float32))
            )
        if n * (int(widths.max())) * 4 <= 2_000_000_000:
            cands["ell"] = scipy_to_ell(A, np.float32)
        chosen = type(pick_unstructured(A, np.float32, need_rmatvec=False)
                      ).__name__
        times = {}
        for k, op in sorted(cands.items()):
            try:
                lo, hi = (20, 80) if n > 200_000 else (50, 200)
                times[k] = time_matvec(op, n, lo, hi)
            except Exception as e:
                print(f"  {k} timing failed: {type(e).__name__}: {e}",
                      flush=True)
        best = min(times, key=times.get) if times else "?"
        rep = " ".join(f"{k}={v*1e6:.0f}us" for k, v in sorted(times.items()))
        print(f"[{name} L{li}] n={n} nnz={A.nnz} picker={chosen} "
              f"fastest={best} | {rep}", flush=True)


t0 = time.time()
a = gallery.expander_laplacian(1_000_000, degree=6)
print(f"expander 1M assembly {time.time()-t0:.0f}s", flush=True)
levels = hierarchy(a, "expander1M")
validate(levels, "expander1M")
del a, levels

t0 = time.time()
a = gallery.fem_poisson_2d(1_000_000, shift=1.0)
print(f"fem 1M assembly {time.time()-t0:.0f}s", flush=True)
levels = hierarchy(a, "fem1M")
validate(levels, "fem1M")

print("R4 STAGE 9 DONE", flush=True)
