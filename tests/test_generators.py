"""Synthetic GAP-workload generators (pygraphblas_tpu/generators.py).

The reference drives its GAP harnesses from downloaded .grb/.mtx files
(gap/prmark.py:40-48); this package generates kron (RMAT) and urand
inputs hermetically, so the generators' contract — deduplicated,
self-loop-free directed edges over 2^scale vertices — is what the
benchmarks stand on.
"""

import numpy as np

from pygraphblas_tpu.generators import rmat_edges, urand_edges, to_matrix
from pygraphblas_tpu import types


def _assert_canonical(rows, cols, n):
    assert rows.min() >= 0 and rows.max() < n
    assert cols.min() >= 0 and cols.max() < n
    assert (rows != cols).all(), "self-loops survived dedup"
    keys = rows * n + cols
    assert len(np.unique(keys)) == len(keys), "duplicate edges survived"


def test_rmat_edges_canonical():
    rows, cols, n = rmat_edges(10, 16, seed=5)
    assert n == 1 << 10
    # RMAT dedup loses some of the edgefactor*n generated edges
    assert 0.5 * 16 * n < len(rows) <= 16 * n
    _assert_canonical(rows, cols, n)


def test_rmat_seed_determinism():
    r1, c1, _ = rmat_edges(9, 8, seed=11)
    r2, c2, _ = rmat_edges(9, 8, seed=11)
    r3, _, _ = rmat_edges(9, 8, seed=12)
    assert np.array_equal(r1, r2) and np.array_equal(c1, c2)
    assert not np.array_equal(r1, r3)


def test_rmat_skew():
    """RMAT with a=0.57 concentrates degree: the top-1% of rows must
    hold well more than 1% of the edges (the hub structure the
    balance= relabeling in parallel/dist.py exists for)."""
    rows, cols, n = rmat_edges(12, 16, seed=3)
    deg = np.bincount(rows, minlength=n)
    top = np.sort(deg)[::-1][: n // 100].sum()
    assert top > 0.08 * len(rows)


def test_urand_edges_canonical_and_uniform():
    rows, cols, n = urand_edges(10, 16, seed=5)
    _assert_canonical(rows, cols, n)
    # urand has no hubs: max degree stays near the Poisson tail
    deg = np.bincount(rows, minlength=n)
    assert deg.max() < 16 * 4


def test_to_matrix_roundtrip():
    rows, cols, n = rmat_edges(8, 4, seed=2)
    A = to_matrix(rows, cols, n, types.FP32)
    assert A.nrows == A.ncols == n
    assert A.nvals == len(rows)
    r, c, v = A.to_lists()
    keys_in = np.sort(rows * n + cols)
    keys_out = np.sort(np.asarray(r, np.int64) * n + np.asarray(c))
    assert np.array_equal(keys_in, keys_out)
