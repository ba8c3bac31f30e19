"""Native (C++) setup-kernel equivalence vs the Python oracle.

The native module (kryst_tpu/native/kernels.cc) replicates the Python
implementations in pc/ilu.py and pc/coloring.py arithmetic-exactly — same
elimination order, same stable tie-breaking — so these tests assert
BITWISE-identical factors/colors/levels, not just approximate agreement.
"""
import numpy as np
import pytest
import scipy.sparse as sp

from kryst_tpu import native
from kryst_tpu.matrix.csr import CSRMatrix
from kryst_tpu.matrix.gallery import poisson_2d
from kryst_tpu.pc import coloring
from kryst_tpu.pc.ilu import (
    _csr_to_rowdicts,
    _factor_ikj,
    _rowdicts_to_LU,
    ilu0,
    ilup,
    ilut,
)

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="no C++ toolchain — Python fallback in use"
)


def _rand_csr(n, density, seed, spd_shift=True):
    rng = np.random.default_rng(seed)
    a = sp.random(n, n, density=density, random_state=rng, format="csr")
    a = a + a.T + spd_shift * sp.eye(n) * (2.0 * density * n)
    a = sp.csr_matrix(a)
    a.sort_indices()
    a.sum_duplicates()
    return CSRMatrix(a.indptr.astype(np.int64), a.indices.astype(np.int64),
                     a.data.astype(np.float64), a.shape)


def _python_factored_csr(a):
    """Combined factored rows via the Python oracle, as sorted CSR arrays."""
    rows = _factor_ikj(_csr_to_rowdicts(a), a.shape[0])
    L, U = _rowdicts_to_LU(rows, a.shape[0], np.float64)
    return L, U


@pytest.mark.smoke
def test_ilu0_native_matches_python_bitwise():
    a = _rand_csr(80, 0.08, seed=0)
    fac = native.ilu0(a.indptr, a.indices, a.data, a.shape[0])
    assert fac is not None
    rows = _factor_ikj(_csr_to_rowdicts(a), a.shape[0])
    # reconstruct the python factored values in CSR order
    expect = np.empty_like(fac)
    k = 0
    for i in range(a.shape[0]):
        cols, _ = a.row(i)
        for j in cols:
            expect[k] = rows[i][int(j)]
            k += 1
    np.testing.assert_array_equal(fac, expect)  # bitwise


def test_ilu0_pc_native_vs_python_apply():
    a = poisson_2d(12)
    pc_nat = ilu0(a)
    import kryst_tpu.pc.ilu as ilu_mod

    # force the Python path
    orig = ilu_mod.native.ilu0
    ilu_mod.native.ilu0 = lambda *args, **kw: None
    try:
        pc_py = ilu0(a)
    finally:
        ilu_mod.native.ilu0 = orig
    import jax.numpy as jnp

    r = jnp.asarray(np.random.default_rng(1).standard_normal(a.shape[0]))
    za = np.asarray(pc_nat.apply(r))
    zb = np.asarray(pc_py.apply(r))
    np.testing.assert_array_equal(za, zb)


def test_ilu0_zero_pivot_raises():
    # row 1 has a zero pivot after elimination: [[0,1],[1,0]] pattern
    a = CSRMatrix.from_coo([0, 0, 1, 1], [0, 1, 0, 1],
                           np.array([0.0, 1.0, 1.0, 1.0]), (2, 2))
    with pytest.raises(ZeroDivisionError):
        native.ilu0(a.indptr, a.indices, a.data, 2)


@pytest.mark.parametrize("fill", [1, 2])
def test_ilup_native_matches_python_bitwise(fill):
    a = _rand_csr(60, 0.08, seed=2)
    import kryst_tpu.pc.ilu as ilu_mod

    pc_nat = ilup(a, fill=fill)
    orig = ilu_mod.native.ilup
    ilu_mod.native.ilup = lambda *args, **kw: None
    try:
        pc_py = ilup(a, fill=fill)
    finally:
        ilu_mod.native.ilup = orig
    for f_nat, f_py in [(pc_nat.L, pc_py.L), (pc_nat.U, pc_py.U)]:
        np.testing.assert_array_equal(np.asarray(f_nat.data), np.asarray(f_py.data))
        np.testing.assert_array_equal(np.asarray(f_nat.cols), np.asarray(f_py.cols))
        np.testing.assert_array_equal(np.asarray(f_nat.diag), np.asarray(f_py.diag))
        np.testing.assert_array_equal(np.asarray(f_nat.levels), np.asarray(f_py.levels))


@pytest.mark.parametrize("fill,droptol", [(5, 1e-3), (10, 1e-4), (3, 1e-2)])
def test_ilut_native_matches_python_bitwise(fill, droptol):
    a = _rand_csr(60, 0.1, seed=3)
    import kryst_tpu.pc.ilu as ilu_mod

    pc_nat = ilut(a, fill=fill, droptol=droptol)
    orig = ilu_mod.native.ilut
    ilu_mod.native.ilut = lambda *args, **kw: None
    try:
        pc_py = ilut(a, fill=fill, droptol=droptol)
    finally:
        ilu_mod.native.ilut = orig
    for f_nat, f_py in [(pc_nat.L, pc_py.L), (pc_nat.U, pc_py.U)]:
        np.testing.assert_array_equal(np.asarray(f_nat.data), np.asarray(f_py.data))
        np.testing.assert_array_equal(np.asarray(f_nat.cols), np.asarray(f_py.cols))
        np.testing.assert_array_equal(np.asarray(f_nat.diag), np.asarray(f_py.diag))


def test_level_schedule_native_matches_python():
    a = _rand_csr(100, 0.06, seed=4)
    n = a.shape[0]
    rows_of = np.repeat(np.arange(n), a.row_nnz())
    low = a.indices < rows_of
    lind = a.indices[low]
    lptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(lptr, rows_of[low] + 1, 1)
    np.cumsum(lptr, out=lptr)

    nat = native.level_schedule(lptr, lind, n, lower=True)
    assert nat is not None
    level, nlev = nat
    # python oracle
    exp = np.zeros(n, dtype=np.int64)
    for i in range(n):
        deps = lind[lptr[i]:lptr[i + 1]]
        deps = deps[deps < i]
        if len(deps):
            exp[i] = exp[deps].max() + 1
    np.testing.assert_array_equal(level, exp)
    assert nlev == exp.max() + 1

    # upper schedule via the transpose pattern
    uind = a.indices[~low & (a.indices != rows_of)]
    uptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(uptr, rows_of[~low & (a.indices != rows_of)] + 1, 1)
    np.cumsum(uptr, out=uptr)
    nat_u = native.level_schedule(uptr, uind, n, lower=False)
    level_u, nlev_u = nat_u
    exp_u = np.zeros(n, dtype=np.int64)
    for i in range(n - 1, -1, -1):
        deps = uind[uptr[i]:uptr[i + 1]]
        deps = deps[deps > i]
        if len(deps):
            exp_u[i] = exp_u[deps].max() + 1
    np.testing.assert_array_equal(level_u, exp_u)
    assert nlev_u == exp_u.max() + 1


@pytest.mark.parametrize("distance", [1, 2])
def test_coloring_native_matches_python(distance):
    a = _rand_csr(90, 0.07, seed=5)
    nat = native.color(a.indptr, a.indices, a.shape[0], distance)
    assert nat is not None
    adj = coloring.extract_adjacency(a)
    if distance == 1:
        exp = coloring.greedy_distance1_coloring(adj)
    else:
        exp = coloring.greedy_distance2_coloring(adj)
    np.testing.assert_array_equal(nat, exp)


def test_unsorted_csr_falls_back():
    # native wrappers must refuse unsorted column indices
    indptr = np.array([0, 2, 3], dtype=np.int64)
    indices = np.array([1, 0, 1], dtype=np.int64)  # row 0 unsorted
    data = np.array([1.0, 2.0, 3.0])
    assert native.ilu0(indptr, indices, data, 2) is None
    assert native.color(indptr, indices, 2, 1) is None


def test_extract_blocks_matches_submatrix():
    a = _rand_csr(70, 0.1, seed=6)
    from kryst_tpu.pc._blocks import batched_dense_blocks

    blocks = [np.array([0, 3, 5, 9]), np.arange(10, 30), np.array([64, 68, 69])]
    mats, idx = batched_dense_blocks(a, blocks, np.float64)
    # oracle: the per-block python path
    bmax = max(len(b) for b in blocks)
    exp = np.tile(np.eye(bmax), (len(blocks), 1, 1))
    for k, blk in enumerate(blocks):
        sub = a.submatrix(blk).todense()
        exp[k, : len(blk), : len(blk)] = sub
    np.testing.assert_array_equal(mats, exp)
    for k, blk in enumerate(blocks):
        np.testing.assert_array_equal(idx[k, : len(blk)], blk)
        assert (idx[k, len(blk):] == -1).all()


def test_grow_subdomain_vectorized():
    from kryst_tpu.pc.asm import grow_subdomain

    a = _rand_csr(50, 0.1, seed=7)
    rows = np.array([5, 20])
    # oracle: per-row python growth
    cur = rows
    for _ in range(2):
        nbrs = [cur]
        for i in cur:
            cols, _ = a.row(int(i))
            nbrs.append(cols)
        cur = np.unique(np.concatenate(nbrs))
    got = grow_subdomain(a, rows, 2)
    np.testing.assert_array_equal(got, cur)


def test_filter_rap_matches_python():
    import kryst_tpu.pc.amg as amg_mod

    A = sp.csr_matrix(np.abs(np.random.default_rng(8).standard_normal((60, 60))))
    A = A + A.T + sp.eye(60) * 10
    A = sp.csr_matrix(A)
    # sparsify so drops actually happen
    A.data[np.abs(A.data) < 0.8] *= 1e-6
    A.eliminate_zeros()
    A.sort_indices()
    got = amg_mod._filter_rap(A, 0.1)
    orig = native.filter_rap
    native.filter_rap = lambda *a, **k: None
    try:
        exp = amg_mod._filter_rap(A, 0.1)
    finally:
        native.filter_rap = orig
    assert got.shape == exp.shape
    d = (got - exp).tocoo()
    assert len(d.data) == 0 or np.abs(d.data).max() < 1e-14
    # pattern identical (explicit diagonal everywhere)
    got.sort_indices(); exp.sort_indices()
    np.testing.assert_array_equal(got.indptr, exp.indptr)
    np.testing.assert_array_equal(got.indices, exp.indices)
    np.testing.assert_array_equal(got.data, exp.data)  # bitwise


def _dia_oracle(indptr, indices, data, n, out_dtype):
    """The numpy path of ops/dia.py::csr_to_dia (duplicate-accumulating)."""
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    d = np.asarray(indices, dtype=np.int64) - rows
    offs = np.unique(d)
    panel = np.zeros((len(offs), n), dtype=out_dtype)
    np.add.at(panel, (np.searchsorted(offs, d), rows), data.astype(out_dtype))
    return offs, panel


@pytest.mark.parametrize("out_dtype", [np.float32, np.float64])
@pytest.mark.parametrize("idx_dtype", [np.int32, np.int64])
def test_csr_to_dia_fill_matches_numpy_bitwise(out_dtype, idx_dtype):
    rng = np.random.default_rng(7)
    n = 2048
    m = sp.random(n, n, density=0.005, random_state=rng, format="csr")
    m = (m + sp.eye(n)).tocsr()
    m.sum_duplicates()
    indptr = m.indptr.astype(idx_dtype)
    indices = m.indices.astype(idx_dtype)
    res = native.csr_to_dia_fill(indptr, indices, m.data, n, 2 * n, out_dtype)
    assert res is not None and res[0] is not None
    offs, panel = _dia_oracle(m.indptr, m.indices, m.data, n, out_dtype)
    assert np.array_equal(res[0], offs)
    assert np.array_equal(res[1], panel)


def test_csr_to_dia_fill_duplicates_accumulate_like_add_at():
    # duplicate (row, col) pairs: f32 accumulation in CSR order == np.add.at
    indptr = np.array([0, 3, 5], dtype=np.int64)
    indices = np.array([0, 1, 0, 1, 1], dtype=np.int64)
    data = np.array([1.1, 2.2, 3.3, 4.4, 5.5])
    res = native.csr_to_dia_fill(indptr, indices, data, 2, 8, np.float32)
    offs, panel = _dia_oracle(indptr, indices, data, 2, np.float32)
    assert np.array_equal(res[0], offs)
    assert np.array_equal(res[1], panel)


def test_csr_to_dia_fill_overflow_reports_count():
    rng = np.random.default_rng(3)
    n = 512
    m = (sp.random(n, n, density=0.05, random_state=rng) + sp.eye(n)).tocsr()
    m.sum_duplicates()
    offs, _ = _dia_oracle(m.indptr, m.indices, m.data, n, np.float64)
    res = native.csr_to_dia_fill(m.indptr, m.indices, m.data, n, 3, np.float64)
    assert res[0] is None and res[1] == len(offs)
