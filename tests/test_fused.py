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
