"""Round-3 setup-path regression tests: direct CSR assembly, canonical
DIA scatter, and the transpose="symmetric" fast path."""
import numpy as np
import pytest
import scipy.sparse as sp

from kryst_tpu.matrix import gallery
from kryst_tpu.matrix.csr import CSRMatrix
from kryst_tpu.ops.dia import csr_to_dia, scipy_to_dia


def _sp(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)


@pytest.mark.parametrize("dims", [(4,), (5, 3, 2), (6, 7, 5)])
def test_poisson3d_direct_assembly_matches_coo(dims):
    """The sort-free direct CSR build equals the from_coo construction."""
    a = gallery.poisson_3d(*dims)
    nx = dims[0]
    ny = dims[1] if len(dims) > 1 else nx
    nz = dims[2] if len(dims) > 2 else nx
    n = nx * ny * nz
    ii, jj, kk = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    lin = (ii * ny + jj) * nz + kk
    rows, cols, vals = [lin.ravel()], [lin.ravel()], [np.full(n, 6.0)]
    for axis, extent in ((0, nx), (1, ny), (2, nz)):
        for sgn in (-1, 1):
            coord = (ii, jj, kk)[axis]
            mask = (coord + sgn >= 0) & (coord + sgn < extent)
            stride = (ny * nz, nz, 1)[axis]
            r = lin[mask]
            rows.append(r)
            cols.append(r + sgn * stride)
            vals.append(np.full(r.size, -1.0))
    ref = CSRMatrix.from_coo(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals), (n, n)
    )
    assert (_sp(a) != _sp(ref)).nnz == 0
    # columns strictly increasing within every row (canonical CSR)
    r = np.repeat(np.arange(n), np.diff(a.indptr))
    same = r[1:] == r[:-1]
    assert np.all(np.diff(a.indices)[same] > 0)


def test_csr_to_dia_noncanonical_rows():
    """Rows with unsorted/duplicate columns take the add.at path."""
    # A[0,:] holds a duplicate (0,1) entry and unsorted columns
    indptr = np.array([0, 4, 6])
    indices = np.array([1, 0, 1, 0, 0, 1])
    data = np.array([2.0, 1.0, 3.0, 4.0, 7.0, 8.0])
    a = CSRMatrix(indptr, indices, data, (2, 2))
    A = csr_to_dia(a, dtype=np.float64)
    dense = np.array([[5.0, 5.0], [7.0, 8.0]])
    x = np.array([1.0, 10.0])
    np.testing.assert_allclose(np.asarray(A.matvec(x)), dense @ x)


def test_scipy_to_dia_matches_csr_to_dia():
    a = gallery.convection_diffusion_2d(12, beta=7.0)
    A1 = csr_to_dia(a, dtype=np.float64)
    A2 = scipy_to_dia(_sp(a), dtype=np.float64)
    assert A1.offsets == A2.offsets
    np.testing.assert_array_equal(np.asarray(A1.data), np.asarray(A2.data))


def test_transpose_symmetric_assertion_fast_path():
    a = gallery.poisson_2d(12)
    A = scipy_to_dia(_sp(a), dtype=np.float64, transpose="symmetric")
    x = np.linspace(-1, 1, a.shape[0])
    # rmatvec must equal matvec for the asserted-symmetric operator
    np.testing.assert_allclose(
        np.asarray(A.rmatvec(x)), np.asarray(A.matvec(x)), rtol=1e-12
    )
