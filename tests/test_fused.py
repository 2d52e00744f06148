"""Fused whole-loop algorithms must match the eager implementations."""

import numpy as np
import networkx as nx
import pytest

from pygraphblas_tpu import Matrix, types
from pygraphblas_tpu import fused
from pygraphblas_tpu import algorithms


@pytest.fixture(scope="module")
def karate_matrix():
    G = nx.karate_club_graph()
    n = G.number_of_nodes()
    I, J = [], []
    for u, v in G.edges():
        I += [u, v]
        J += [v, u]
    A = Matrix.sparse(types.FP32, n, n)
    A._build(np.asarray(I), np.asarray(J), np.ones(len(I), np.float32))
    return A, G


def test_fused_pagerank(karate_matrix):
    A, G = karate_matrix
    r = fused.pagerank(A, itermax=100, tol=1e-7)
    expect = nx.pagerank(G, alpha=0.85, tol=1e-10, weight=None)
    got = r.to_numpy()
    for node, val in expect.items():
        assert abs(got[node] - val) < 1e-3
    eager = algorithms.pagerank(A, itermax=100, tol=1e-7)
    assert np.allclose(got, eager.to_numpy(), atol=1e-5)


def test_fused_bfs(karate_matrix):
    A, G = karate_matrix
    lv = fused.bfs_level(A, 0)
    expect = nx.single_source_shortest_path_length(G, 0)
    got = dict(iter(lv))
    assert set(got) == set(expect)
    for node, d in expect.items():
        assert got[node] == d + 1


def test_fused_sssp():
    G = nx.DiGraph()
    G.add_weighted_edges_from([
        (0, 1, 9.0), (0, 3, 3.0), (1, 2, 8.0), (3, 4, 6.0), (3, 5, 1.0),
        (4, 2, 4.0), (1, 5, 7.0), (5, 4, 2.0),
    ])
    A = Matrix.sparse(types.FP64, 6, 6)
    for u, v, w in G.edges(data="weight"):
        A[u, v] = w
    d = fused.sssp(A, 0)
    expect = nx.single_source_dijkstra_path_length(G, 0)
    got = dict(iter(d))
    assert set(got) == set(expect)
    for node, dist in expect.items():
        assert got[node] == dist


def test_fused_bc_matches_eager():
    import pygraphblas_tpu.core.xspmv as X
    import numpy as np
    from pygraphblas_tpu import Matrix, types, fused, algorithms
    from pygraphblas_tpu.base import options_set

    rng = np.random.RandomState(23)
    n, nnz = 250, 1800
    r = rng.randint(0, n, nnz)
    c = rng.randint(0, n, nnz)
    keep = r != c
    r, c = r[keep], c[keep]
    _, ui = np.unique(r.astype(np.int64) * n + c, return_index=True)
    r, c = r[ui], c[ui]
    A = Matrix.from_lists(list(r), list(c), [1.0] * len(r), n, n,
                          typ=types.FP32)
    sources = [0, 5, 10, 15]
    want = algorithms.betweenness_centrality(A, sources)
    old = X.MIN_NNZ
    X.MIN_NNZ = 1
    try:
        options_set(spmv_engine="xspmv")
        got = fused.bc(A, sources)
    finally:
        X.MIN_NNZ = old
        options_set(spmv_engine="auto")
    wv, wm = want._dense_pair(np.float32)
    gv, gm = got._dense_pair(np.float32)
    wv = np.where(np.asarray(wm), np.asarray(wv), 0.0)
    gv = np.where(np.asarray(gm), np.asarray(gv), 0.0)
    assert np.allclose(wv, gv, rtol=1e-4, atol=1e-4), np.abs(wv - gv).max()


def test_bfs_batch_matches_single():
    rng = np.random.RandomState(5)
    n = 500
    nnz = 40000
    key = np.unique(rng.randint(0, n, nnz) * n + rng.randint(0, n, nnz))
    I, J = key // n, key % n
    A = Matrix.sparse(types.FP32, n, n)
    A._build(I, J, np.ones(len(I), np.float32))
    lvb = np.asarray(fused.bfs_batch(A, [0, 3, 7]))
    for k, s in enumerate([0, 3, 7]):
        want = fused.bfs_level(A, s).to_numpy()
        assert np.array_equal(lvb[k], want.astype(lvb.dtype))
