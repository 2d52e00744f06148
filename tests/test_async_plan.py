"""Async xspmv plan build (options_set(spmv_plan_async=True)): calls run
a planless engine instantly while the plan builds in a background
thread, then upgrade.  Mirrors the reference's behavior of never
blocking an op on an auxiliary optimization (SuiteSparse builds its
internal formats lazily per op; matrix.py:2572 dispatch is one C call
regardless), re-designed for the plan-based TPU engine where the plan
is a minutes-scale compile-like cost at GAP scale.
"""

import time

import numpy as np
import pytest

from pygraphblas_tpu import Matrix, Vector, types, fused, options_set
from pygraphblas_tpu.generators import rmat_edges, to_matrix


@pytest.fixture
def async_mode():
    from pygraphblas_tpu.base import config

    prev_cells = config.bitmap_max_cells
    options_set(spmv_plan_async=True)
    yield
    options_set(spmv_plan_async=False, bitmap_max_cells=prev_cells)


def _wait_plan(A, key, timeout=120):
    deadline = time.time() + timeout
    while time.time() < deadline:
        cache = A._ell_c or {}
        if key in cache:
            return True
        time.sleep(0.05)
    return False


def test_pagerank_async_plan_upgrade(async_mode):
    rows, cols, n = rmat_edges(12, 16, seed=3)
    A = to_matrix(rows, cols, n, types.FP32)
    r1 = fused.pagerank(A, itermax=20, tol=0.0)  # instant COO tier
    key = ("x", True, np.dtype(np.float32).str)
    assert _wait_plan(A, key), "background plan build never landed"
    r2 = fused.pagerank(A, itermax=20, tol=0.0)  # upgraded engine
    v1 = np.asarray(r1._vals)
    v2 = np.asarray(r2._vals)
    np.testing.assert_allclose(v1, v2, rtol=1e-4, atol=1e-8)


def test_eager_mxv_async_upgrade(async_mode):
    rows, cols, n = rmat_edges(12, 16, seed=4)
    # force the matrix onto the sparse tier (n^2 cells > threshold) while
    # the length-n vector stays dense — the xspmv-eligible eager path
    options_set(bitmap_max_cells=1 << 20)
    A = to_matrix(rows, cols, n, types.FP32)
    x = Vector.dense(types.FP32, n, fill=1.5)
    y1 = A.mxv(x, semiring=types.FP32.PLUS_TIMES)
    key = ("x", False, np.dtype(np.float32).str)
    assert _wait_plan(A, key), "background plan build never landed"
    y2 = A.mxv(x, semiring=types.FP32.PLUS_TIMES)
    np.testing.assert_allclose(np.asarray(y1._vals), np.asarray(y2._vals),
                               rtol=1e-4, atol=1e-8)


def test_async_plan_stale_write_discarded(async_mode):
    rows, cols, n = rmat_edges(12, 16, seed=5)
    A = to_matrix(rows, cols, n, types.FP32)
    fused.pagerank(A, itermax=2, tol=0.0)       # kicks off the build
    A[0, 1] = 2.0                                # mutation resets caches
    A.wait()
    # the stale build (old dict) must never surface in the new cache
    time.sleep(1.0)
    cache = A._ell_c or {}
    assert ("x", True, np.dtype(np.float32).str) not in cache
    r = fused.pagerank(A, itermax=5, tol=0.0)    # fresh build or COO tier
    assert np.isfinite(np.asarray(r._vals)).all()
