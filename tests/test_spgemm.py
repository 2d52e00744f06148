"""Masked sparse SpGEMM on huge matrices vs dense oracles, including
GAP-config triangle counting at forced-sparse scale."""

import numpy as np
import networkx as nx
import pytest

from pygraphblas_tpu import Matrix, types, descriptor
from pygraphblas_tpu.algorithms import triangle_count, k_truss

N = 10_000  # forces the sparse path


def rand_graph(seed=5, nnz=30_000, symmetric=True):
    rng = np.random.RandomState(seed)
    rows = rng.randint(0, N, nnz)
    cols = rng.randint(0, N, nnz)
    keep = rows != cols
    rows, cols = rows[keep], cols[keep]
    if symmetric:
        rows, cols = (np.concatenate([rows, cols]),
                      np.concatenate([cols, rows]))
    keys = rows.astype(np.int64) * N + cols
    _, idx = np.unique(keys, return_index=True)
    return rows[idx], cols[idx]


def test_masked_spgemm_plus_times_matches_oracle():
    rows, cols = rand_graph()
    rng = np.random.RandomState(1)
    vals = rng.rand(len(rows)).astype(np.float32)
    A = Matrix.sparse(types.FP32, N, N)
    A._build(rows, cols, vals)
    mask = Matrix.sparse(types.BOOL, N, N)
    mask._build(rows[:500], cols[:500], np.ones(500, np.bool_))
    C = A.mxm(A, mask=mask, desc=descriptor.S)
    # oracle with scipy
    from scipy import sparse

    S = sparse.coo_matrix((vals, (rows, cols)), shape=(N, N)).tocsr()
    P = (S @ S).tocsr()
    for i, j, v in C:
        assert abs(P[i, j] - v) < 1e-3
    # every mask position with a structural match must be present
    got = {(i, j) for i, j, _ in C}
    pattern = (S != 0).astype(np.int8)
    PP = (pattern @ pattern).tocsr()
    for i, j in zip(rows[:500], cols[:500]):
        if PP[i, j] > 0:
            assert (int(i), int(j)) in got


def test_sparse_triangle_count_matches_networkx():
    rows, cols = rand_graph(seed=7, nnz=40_000)
    G = nx.Graph()
    G.add_nodes_from(range(N))
    G.add_edges_from(zip(rows.tolist(), cols.tolist()))
    A = Matrix.sparse(types.INT64, N, N)
    A._build(rows, cols, np.ones(len(rows), np.int64))
    assert A._is_huge
    expect = sum(nx.triangles(G).values()) // 3
    assert triangle_count(A, "sandia") == expect
    assert triangle_count(A, "cohen") == expect
    assert triangle_count(A, "sandia_dot") == expect


def test_sparse_ktruss():
    # triangle + pendant embedded in a huge id space
    I = [0, 1, 1, 2, 0, 2, 3, 2]
    J = [1, 0, 2, 1, 2, 0, 2, 3]
    A = Matrix.sparse(types.INT64, N, N)
    A._build(np.asarray(I), np.asarray(J), np.ones(len(I), np.int64))
    t3 = k_truss(A, 3)
    assert t3.nvals == 6  # the triangle survives, pendant edge dropped


def test_min_plus_masked_spgemm():
    # all-pairs-shortest-path style relaxation step on huge ids
    I = [0, 1, 0]
    J = [1, 2, 2]
    V = [1.0, 2.0, 10.0]
    A = Matrix.sparse(types.FP64, N, N)
    A._build(np.asarray(I), np.asarray(J), np.asarray(V))
    mask = Matrix.sparse(types.BOOL, N, N)
    mask._build(np.asarray([0]), np.asarray([2]), np.ones(1, np.bool_))
    C = A.mxm(A, semiring=types.FP64.min_plus, mask=mask,
              desc=descriptor.S)
    assert C[0, 2] == 3.0  # 0->1->2


def test_masked_spgemm_any_pair_and_min_pair():
    """PAIR-mul semirings with non-PLUS adds: the value is 1 wherever the
    intersection is nonempty, not the intersection count (ADVICE r1)."""
    from pygraphblas_tpu import semiring as sr

    rows, cols = rand_graph(seed=9, nnz=8_000)
    A = Matrix.sparse(types.INT64, N, N)
    A._build(rows, cols, np.ones(len(rows), np.int64))
    mask = Matrix.sparse(types.BOOL, N, N)
    mask._build(rows[:400], cols[:400], np.ones(400, np.bool_))
    Cp = A.mxm(A, semiring=sr.PLUS_PAIR_INT64, mask=mask, desc=descriptor.S)
    for s in (sr.ANY_PAIR_INT64, sr.MIN_PAIR_INT64, sr.MAX_PAIR_INT64):
        C1 = A.mxm(A, semiring=s, mask=mask, desc=descriptor.S)
        ri, ci, vi = C1.to_lists()
        rp, cp, vp = Cp.to_lists()
        assert (ri, ci) == (rp, cp)     # same pattern as the count version
        assert all(v == 1 for v in vi)  # but every present value is 1


def test_heavy_edge_fallback():
    """Mask edges whose combined adjacency exceeds WIDTH_CAP go through
    the batched host-intersect fallback; values must match the oracle."""
    from pygraphblas_tpu import semiring as sr

    rng = np.random.RandomState(2)
    n = 20_000
    hub_deg = 9_000  # > WIDTH_CAP/2 so hub-hub edges are heavy
    hubs = [0, 1]
    rows = np.concatenate([
        np.full(hub_deg, hubs[0]), np.full(hub_deg, hubs[1]),
        rng.randint(2, n, 5_000)])
    cols = np.concatenate([
        rng.choice(n, hub_deg, replace=False),
        rng.choice(n, hub_deg, replace=False),
        rng.randint(2, n, 5_000)])
    keep = rows != cols
    rows, cols = rows[keep].astype(np.int64), cols[keep].astype(np.int64)
    keys = rows * n + cols
    _, idx = np.unique(keys, return_index=True)
    rows, cols = rows[idx], cols[idx]
    vals = rng.rand(len(rows))
    A = Matrix.sparse(types.FP64, 10**9, 10**9)  # force sparse tier
    A._build(rows, cols, vals)
    mask = Matrix.sparse(types.BOOL, 10**9, 10**9)
    # hub-hub mask edges = heavy; some light ones too
    mr = np.asarray([0, 1, 0] + rows[:50].tolist(), np.int64)
    mc = np.asarray([1, 0, 2] + cols[:50].tolist(), np.int64)
    mask._build(mr, mc, np.ones(len(mr), bool))
    C = A.mxm(A, semiring=sr.PLUS_TIMES_FP64, mask=mask,
              desc=descriptor.S)
    # oracle
    from scipy import sparse as sp

    S = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    P = (S @ S).tocsr()
    for i, j, v in zip(*C.to_lists()):
        assert abs(P[i, j] - v) < 1e-9, (i, j, v, P[i, j])
    got = {(i, j) for i, j in zip(*C.to_lists()[:2])}
    for i, j in zip(mr.tolist(), mc.tolist()):
        if P[i, j] != 0 or (i, j) in got:
            assert (i, j) in got or P[i, j] == 0
