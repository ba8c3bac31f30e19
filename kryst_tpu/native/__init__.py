"""Native (C++) host-side setup kernels.

The reference implements its entire setup path in native Rust; kryst_tpu's
device compute path is JAX/XLA/Pallas, and this package is the native
runtime for the host-side setup hot spots (ILU factorizations, level
scheduling, graph coloring — see ``kernels.cc``). The Python implementations
in ``pc/ilu.py`` / ``pc/coloring.py`` remain as the portable fallback AND
the equivalence oracle (tests/test_native.py asserts bitwise-identical
factors).

Build model: ``kernels.cc`` is compiled on first use with ``g++ -O3`` into
``_build/kryst_native_<srchash>.so`` and loaded via ctypes — no build-time
dependency beyond a C++ compiler; environments without one (or with
``KRYST_TPU_NO_NATIVE=1``) silently use the Python paths.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kernels.cc")
_lib: Optional[ctypes.CDLL] = None
_tried = False

_I64P = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
_I32P = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_F64P = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")


def _configure(lib: ctypes.CDLL) -> None:
    lib.kn_ilu0.restype = ctypes.c_int64
    lib.kn_ilu0.argtypes = [ctypes.c_int64, _I64P, _I64P, _F64P]
    lib.kn_ilup.restype = ctypes.c_int64
    lib.kn_ilup.argtypes = [ctypes.c_int64, _I64P, _I64P, _F64P, ctypes.c_int64]
    lib.kn_ilut.restype = ctypes.c_int64
    lib.kn_ilut.argtypes = [
        ctypes.c_int64, _I64P, _I64P, _F64P, ctypes.c_int64, ctypes.c_double,
    ]
    lib.kn_fetch_l.restype = ctypes.c_int64
    lib.kn_fetch_l.argtypes = [ctypes.c_int64, _I64P, _I64P, _F64P]
    lib.kn_fetch_u.restype = ctypes.c_int64
    lib.kn_fetch_u.argtypes = [ctypes.c_int64, _I64P, _I64P, _F64P]
    lib.kn_level_schedule.restype = ctypes.c_int64
    lib.kn_level_schedule.argtypes = [
        ctypes.c_int64, _I64P, _I64P, ctypes.c_int64, _I64P,
    ]
    lib.kn_color.restype = ctypes.c_int64
    lib.kn_color.argtypes = [ctypes.c_int64, _I64P, _I64P, ctypes.c_int64, _I64P]
    lib.kn_filter_rap.restype = ctypes.c_int64
    lib.kn_filter_rap.argtypes = [
        ctypes.c_int64, _I64P, _I64P, _F64P, ctypes.c_double,
    ]
    lib.kn_filter_rap32.restype = ctypes.c_int64
    lib.kn_filter_rap32.argtypes = [
        ctypes.c_int64, _I32P, _I32P, _F64P, ctypes.c_double,
    ]
    lib.kn_extract_blocks.restype = None
    lib.kn_extract_blocks.argtypes = [
        ctypes.c_int64, _I64P, _I64P, _F64P,
        ctypes.c_int64, ctypes.c_int64, _I64P, _F64P,
    ]
    _F32P = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
    lib.kn_dia_offsets.restype = ctypes.c_int64
    lib.kn_dia_offsets.argtypes = [
        ctypes.c_int64, _I64P, _I64P, ctypes.c_int64, _I64P,
    ]
    lib.kn_dia_offsets32.restype = ctypes.c_int64
    lib.kn_dia_offsets32.argtypes = [
        ctypes.c_int64, _I32P, _I32P, ctypes.c_int64, _I64P,
    ]
    lib.kn_csr_to_dia_f32.restype = None
    lib.kn_csr_to_dia_f32.argtypes = [
        ctypes.c_int64, _I64P, _I64P, _F64P, ctypes.c_int64, _I64P, _F32P,
    ]
    lib.kn_csr_to_dia_f32_i32.restype = None
    lib.kn_csr_to_dia_f32_i32.argtypes = [
        ctypes.c_int64, _I32P, _I32P, _F64P, ctypes.c_int64, _I64P, _F32P,
    ]
    lib.kn_csr_to_dia_f64.restype = None
    lib.kn_csr_to_dia_f64.argtypes = [
        ctypes.c_int64, _I64P, _I64P, _F64P, ctypes.c_int64, _I64P, _F64P,
    ]
    lib.kn_csr_to_dia_f64_i32.restype = None
    lib.kn_csr_to_dia_f64_i32.argtypes = [
        ctypes.c_int64, _I32P, _I32P, _F64P, ctypes.c_int64, _I64P, _F64P,
    ]


def get_lib() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native library; None if unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("KRYST_TPU_NO_NATIVE"):
        return None
    override = os.environ.get("KRYST_TPU_NATIVE_LIB")
    if override:
        # debugging hook: load a pre-built library (e.g. an ASan build:
        # g++ -g -fsanitize=address ... + LD_PRELOAD=libasan.so)
        try:
            lib = ctypes.CDLL(override)
            _configure(lib)
            _lib = lib
        except Exception:
            _lib = None
        return _lib
    try:
        with open(_SRC, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        so = os.path.join(_HERE, "_build", f"kryst_native_{tag}.so")
        if not os.path.exists(so):
            os.makedirs(os.path.dirname(so), exist_ok=True)
            tmp = so + f".{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True, capture_output=True, timeout=300,
            )
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        _configure(lib)
        _lib = lib
    except Exception:  # no compiler / load failure -> Python fallback
        _lib = None
    return _lib


def _csr_sorted(indices: np.ndarray, indptr: np.ndarray) -> bool:
    """Ascending column indices within every row (the kernels' precondition)."""
    if len(indices) < 2:
        return True
    asc = indices[1:] > indices[:-1]
    # row boundaries are not constrained; empty rows can push a boundary
    # index out of [0, nnz-2] — mask those out
    b = np.asarray(indptr[1:-1], dtype=np.int64) - 1
    asc[b[(b >= 0) & (b < len(asc))]] = True
    return bool(asc.all())


def _prep(indptr, indices, data=None):
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    if not _csr_sorted(indices, indptr):
        return None
    if data is None:
        return indptr, indices
    return indptr, indices, np.ascontiguousarray(data, dtype=np.float64)


def ilu0(indptr, indices, data, n: int) -> Optional[np.ndarray]:
    """ILU(0) factored values on A's pattern (in-place IKJ on a copy).

    Returns the factored data array, or None if the native path is
    unavailable (caller falls back to Python). Raises ZeroDivisionError on a
    zero pivot — same contract as the Python ``_factor_ikj``.
    """
    lib = get_lib()
    if lib is None:
        return None
    prep = _prep(indptr, indices, data)
    if prep is None:
        return None
    indptr, indices, out = prep
    out = out.copy()
    rc = lib.kn_ilu0(n, indptr, indices, out)
    if rc != 0:
        raise ZeroDivisionError(f"zero pivot at row {rc - 1}")
    return out


def ilup(indptr, indices, data, n: int, fill: int):
    """ILU(p): returns the combined factored CSR (L strict + diag + U) as
    (indptr, indices, data), or None if native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    prep = _prep(indptr, indices, data)
    if prep is None:
        return None
    indptr, indices, data = prep
    nnz = lib.kn_ilup(n, indptr, indices, data, fill)
    if nnz < 0:
        raise ZeroDivisionError(f"zero pivot at row {-nnz - 1}")
    optr = np.empty(n + 1, dtype=np.int64)
    oind = np.empty(nnz, dtype=np.int64)
    odat = np.empty(nnz, dtype=np.float64)
    if lib.kn_fetch_u(n, optr, oind, odat) != 0:  # pragma: no cover
        return None
    return optr, oind, odat


def ilut(indptr, indices, data, n: int, fill: int, droptol: float):
    """ILUT: returns ((l_indptr, l_indices, l_data), (u_indptr, u_indices,
    u_data)) — L strict lower (unit diag implied), U upper incl. diagonal —
    or None if native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    prep = _prep(indptr, indices, data)
    if prep is None:
        return None
    indptr, indices, data = prep
    packed = lib.kn_ilut(n, indptr, indices, data, fill, droptol)
    if packed < 0:  # pragma: no cover — factor nnz >= 2^32
        return None
    lnnz, unnz = packed >> 32, packed & 0xFFFFFFFF
    lptr = np.empty(n + 1, dtype=np.int64)
    lind = np.empty(lnnz, dtype=np.int64)
    ldat = np.empty(lnnz, dtype=np.float64)
    uptr = np.empty(n + 1, dtype=np.int64)
    uind = np.empty(unnz, dtype=np.int64)
    udat = np.empty(unnz, dtype=np.float64)
    if lib.kn_fetch_l(n, lptr, lind, ldat) != 0:  # pragma: no cover
        return None
    if lib.kn_fetch_u(n, uptr, uind, udat) != 0:  # pragma: no cover
        return None
    return (lptr, lind, ldat), (uptr, uind, udat)


def level_schedule(indptr, indices, n: int, lower: bool) -> Optional[Tuple[np.ndarray, int]]:
    """Per-row wavefront level for a strictly-triangular pattern.
    Returns (level array, nlevels) or None."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    level = np.empty(n, dtype=np.int64)
    nlev = lib.kn_level_schedule(n, indptr, indices, 1 if lower else 0, level)
    return level, int(nlev)


def filter_rap(indptr, indices, data, n: int, drop_tol: float):
    """AMG RAP filtering (see kernels.cc). Returns (indptr, indices, data)
    of the filtered CSR (explicit diagonal in every row), or None."""
    lib = get_lib()
    if lib is None:
        return None
    if (
        np.asarray(indptr).dtype == np.int32
        and np.asarray(indices).dtype == np.int32
    ):
        # scipy CSRs carry int32 indices; skip the int64 copy (1.5 s of a
        # 9 s AMG setup at 65k)
        indptr = np.ascontiguousarray(indptr, dtype=np.int32)
        indices = np.ascontiguousarray(indices, dtype=np.int32)
        data = np.ascontiguousarray(data, dtype=np.float64)
        if not _csr_sorted(indices, indptr):
            return None
        nnz = lib.kn_filter_rap32(n, indptr, indices, data, drop_tol)
    else:
        prep = _prep(indptr, indices, data)
        if prep is None:
            return None
        indptr, indices, data = prep
        nnz = lib.kn_filter_rap(n, indptr, indices, data, drop_tol)
    optr = np.empty(n + 1, dtype=np.int64)
    oind = np.empty(nnz, dtype=np.int64)
    odat = np.empty(nnz, dtype=np.float64)
    if lib.kn_fetch_u(n, optr, oind, odat) != 0:  # pragma: no cover
        return None
    return optr, oind, odat


def extract_blocks(indptr, indices, data, n: int, idx_pad: np.ndarray) -> Optional[np.ndarray]:
    """Batched dense principal submatrices for (nb, bmax) -1-padded row
    sets. Returns (nb, bmax, bmax) f64 blocks (zero-padded), or None."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    data = np.ascontiguousarray(data, dtype=np.float64)
    idx_pad = np.ascontiguousarray(idx_pad, dtype=np.int64)
    nb, bmax = idx_pad.shape
    out = np.zeros((nb, bmax, bmax), dtype=np.float64)
    lib.kn_extract_blocks(n, indptr, indices, data, nb, bmax, idx_pad, out)
    return out


def color(indptr, indices, n: int, distance: int) -> Optional[np.ndarray]:
    """Greedy distance-1/2 coloring. Returns colors array or None."""
    lib = get_lib()
    if lib is None:
        return None
    prep = _prep(indptr, indices)
    if prep is None:
        return None
    indptr, indices = prep
    colors = np.empty(n, dtype=np.int64)
    lib.kn_color(n, indptr, indices, distance, colors)
    return colors


def csr_to_dia_fill(indptr, indices, data, n: int, max_offsets: int,
                    out_dtype):
    """CSR -> (offsets, (ndiag, n) DIA panel) in one fused native pass.

    Returns ``(offsets_int64, panel)`` on success, ``(None, count)`` when the
    matrix has ``count > max_offsets`` distinct diagonals (caller raises its
    own message), or ``None`` when the native library / dtype combination is
    unavailable (caller falls back to the numpy path). Bitwise-equal to the
    numpy path: ascending-unique offsets (bitmap scan == np.unique), values
    cast via f64 with C semantics (== .astype), duplicates accumulated in the
    output dtype in CSR traversal order (== np.add.at; canonical CSR has no
    duplicates, where += on the zeroed panel equals direct assignment)."""
    out_dtype = np.dtype(out_dtype)
    if out_dtype not in (np.dtype(np.float32), np.dtype(np.float64)):
        return None
    if n <= 0:
        # the native impls size a scratch vector 2*n-1; n=0 would
        # underflow to a huge size_t and abort inside the ctypes call —
        # let the numpy path handle degenerate shapes
        return None
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    i32 = indptr.dtype == np.int32 and indices.dtype == np.int32
    if not i32:
        indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        indices = np.ascontiguousarray(indices, dtype=np.int64)
    else:
        indptr = np.ascontiguousarray(indptr)
        indices = np.ascontiguousarray(indices)
    data = np.ascontiguousarray(data, dtype=np.float64)
    offs = np.empty(max(max_offsets, 1), dtype=np.int64)
    cnt = (lib.kn_dia_offsets32 if i32 else lib.kn_dia_offsets)(
        n, indptr, indices, max_offsets, offs
    )
    if cnt > max_offsets:
        return None, int(cnt)
    offs = np.ascontiguousarray(offs[:cnt])
    out = np.zeros((int(cnt), n), dtype=out_dtype)
    fill = {
        (np.dtype(np.float32), False): lib.kn_csr_to_dia_f32,
        (np.dtype(np.float32), True): lib.kn_csr_to_dia_f32_i32,
        (np.dtype(np.float64), False): lib.kn_csr_to_dia_f64,
        (np.dtype(np.float64), True): lib.kn_csr_to_dia_f64_i32,
    }[(out_dtype, i32)]
    fill(n, indptr, indices, data, int(cnt), offs, out)
    return offs, out
