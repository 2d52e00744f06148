"""Huge-dimension (COO/sparse execution path) tests: matrices too large
for the dense bitmap path must still run the SpMV-family ops on device."""

import numpy as np
import networkx as nx
import pytest

from pygraphblas_tpu import Matrix, Vector, types, descriptor
from pygraphblas_tpu.algorithms import pagerank, bfs_level


N = 10_000  # N*N >> bitmap_max_cells -> forced sparse path


@pytest.fixture(scope="module")
def graph():
    rng = np.random.RandomState(3)
    nnz = 50_000
    rows = rng.randint(0, N, nnz)
    cols = rng.randint(0, N, nnz)
    keep = rows != cols
    rows, cols = rows[keep], cols[keep]
    keys = rows.astype(np.int64) * N + cols
    _, idx = np.unique(keys, return_index=True)
    return rows[idx], cols[idx]


def mkA(rows, cols, typ=types.FP32):
    A = Matrix.sparse(typ, N, N)
    A._build(rows, cols, np.ones(len(rows), typ._numpy_t))
    assert A._fmt == "coo" and A._is_huge
    return A


def test_sparse_mxv_matches_dense_math(graph):
    rows, cols = graph
    A = mkA(rows, cols)
    rng = np.random.RandomState(0)
    xv = rng.rand(N).astype(np.float32)
    x = Vector.from_numpy(xv)
    y = A.mxv(x)
    expect = np.zeros(N, np.float32)
    np.add.at(expect, rows, xv[cols])
    got = y.to_numpy()
    assert np.allclose(got, expect, atol=1e-4)
    # transposed
    y2 = A.mxv(x, desc=descriptor.T0)
    expect2 = np.zeros(N, np.float32)
    np.add.at(expect2, cols, xv[rows])
    assert np.allclose(y2.to_numpy(), expect2, atol=1e-4)


def test_sparse_mxv_masked(graph):
    rows, cols = graph
    A = mkA(rows, cols)
    x = Vector.dense(types.FP32, N, fill=1.0)
    mask = Vector.sparse(types.BOOL, N)
    mask[0] = True
    mask[5] = True
    y = A.mxv(x, mask=mask)
    assert y.nvals <= 2


def test_sparse_reduce_vector_and_degree(graph):
    rows, cols = graph
    A = mkA(rows, cols)
    d = A.reduce_vector()
    expect = np.zeros(N, np.float32)
    np.add.at(expect, rows, 1.0)
    assert np.allclose(d.to_numpy(), expect)
    # column degrees via T0
    dc = A.reduce_vector(desc=descriptor.T0)
    expect_c = np.zeros(N, np.float32)
    np.add.at(expect_c, cols, 1.0)
    assert np.allclose(dc.to_numpy(), expect_c)


def test_sparse_transpose_apply_select(graph):
    rows, cols = graph
    A = mkA(rows, cols)
    T = A.transpose()
    assert T._fmt == "coo"
    assert T.nvals == A.nvals
    r, c, _ = T._coo()
    assert np.array_equal(np.sort(r), np.sort(cols))
    B = A.apply(types.FP32.AINV)
    assert B.nvals == A.nvals
    _, _, v = B._coo()
    assert (v == -1).all()
    S = A.select(">", 0.5)
    assert S.nvals == A.nvals  # all values are 1.0
    S2 = A.tril()
    r2, c2, _ = S2._coo()
    assert (r2 >= c2).all()
    assert A.reduce_float() == float(A.nvals)
    assert A.cast(types.FP64).type is types.FP64


def test_sparse_pagerank_matches_reference_impl(graph):
    rows, cols = graph
    A = mkA(rows, cols)
    r = pagerank(A, damping=0.85, itermax=50, tol=1e-7)
    # oracle: dense power iteration
    deg = np.zeros(N)
    np.add.at(deg, rows, 1.0)
    x = np.ones(N) / N
    for _ in range(50):
        w = np.where(deg > 0, x / np.maximum(deg, 1), 0.0)
        contrib = np.zeros(N)
        np.add.at(contrib, cols, w[rows])
        x_new = 0.15 / N + 0.85 * contrib
        if np.abs(x_new - x).sum() <= 1e-7:
            x = x_new
            break
        x = x_new
    assert np.abs(r.to_numpy() - x).max() < 1e-4


def test_sparse_bfs(graph):
    # small-world connected component check on a path graph embedded huge
    A = Matrix.sparse(types.BOOL, N, N)
    n_path = 50
    idx = np.arange(n_path - 1)
    A._build(np.concatenate([idx, idx + 1]),
             np.concatenate([idx + 1, idx]),
             np.ones(2 * (n_path - 1), np.bool_))
    lv = bfs_level(A, 0)
    got = dict(iter(lv))
    assert got[10] == 11
    assert len(got) == n_path
