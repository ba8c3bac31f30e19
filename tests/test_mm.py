"""MatrixMarket / SuiteSparse loader (BASELINE config 3 data path)."""
import textwrap

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from kryst_tpu import solve
from kryst_tpu.matrix.mm import (
    available_suitesparse,
    load_matrix_market,
    load_suitesparse,
    suitesparse_path,
)

GENERAL = textwrap.dedent("""\
    %%MatrixMarket matrix coordinate real general
    % tiny nonsymmetric test matrix
    3 3 5
    1 1 4.0
    2 2 5.0
    3 3 6.0
    1 2 -1.0
    3 1 0.5
""")

SYMMETRIC = textwrap.dedent("""\
    %%MatrixMarket matrix coordinate real symmetric
    3 3 4
    1 1 4.0
    2 2 5.0
    3 3 6.0
    2 1 -1.0
""")


def test_load_general(tmp_path):
    p = tmp_path / "t.mtx"
    p.write_text(GENERAL)
    a = load_matrix_market(str(p))
    D = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape).toarray()
    exp = np.array([[4, -1, 0], [0, 5, 0], [0.5, 0, 6.0]])
    np.testing.assert_array_equal(D, exp)


def test_load_symmetric_expands_triangle(tmp_path):
    p = tmp_path / "s.mtx"
    p.write_text(SYMMETRIC)
    a = load_matrix_market(str(p))
    D = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape).toarray()
    exp = np.array([[4, -1, 0], [-1, 5, 0], [0, 0, 6.0]])
    np.testing.assert_array_equal(D, exp)
    np.testing.assert_array_equal(D, D.T)


def test_suitesparse_layouts_and_skip(tmp_path, monkeypatch):
    monkeypatch.setenv("KRYST_TPU_SUITESPARSE_DIR", str(tmp_path))
    # flat file
    (tmp_path / "aaa.mtx").write_text(GENERAL)
    # tarball-style subdirectory
    (tmp_path / "bbb").mkdir()
    (tmp_path / "bbb" / "bbb.mtx").write_text(SYMMETRIC)
    assert suitesparse_path("aaa").endswith("aaa.mtx")
    assert "bbb/bbb.mtx" in suitesparse_path("bbb").replace("\\", "/")
    assert available_suitesparse(["aaa", "bbb", "nope"]) == ["aaa", "bbb"]
    with pytest.raises(FileNotFoundError, match="sparse.tamu.edu"):
        load_suitesparse("nope")


def test_solve_on_loaded_matrix(tmp_path):
    p = tmp_path / "s.mtx"
    p.write_text(SYMMETRIC)
    a = load_matrix_market(str(p))
    b = jnp.ones(3)
    x, st = solve(a, b, solver="pcg", pc="jacobi", tol=1e-12, maxiter=50)
    D = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape).toarray()
    np.testing.assert_allclose(D @ np.asarray(x), np.ones(3), atol=1e-10)
