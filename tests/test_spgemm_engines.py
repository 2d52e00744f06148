"""Unmasked SpGEMM engine tiers (core/esc.py, gustavson dense tier) vs
scipy oracles.  Reference behavior: unmasked ``lib.GrB_mxm``
(pygraphblas/matrix.py:2574) — structural pattern = pattern product,
explicit zeros preserved."""

import numpy as np
import pytest
import scipy.sparse as sp

from pygraphblas_tpu import Matrix, types
from pygraphblas_tpu.base import options_set


def _rand_coo(n, m, nnz, seed, vals=None):
    rng = np.random.RandomState(seed)
    keys = np.unique(rng.randint(0, n * m, nnz))
    r = (keys // m).astype(np.int64)
    c = (keys % m).astype(np.int64)
    v = rng.rand(len(r)).astype(np.float32) + 0.5 if vals is None \
        else vals(rng, len(r))
    return r, c, v


def _mat(r, c, v, n, m, typ=types.FP32):
    return Matrix.from_lists(list(map(int, r)), list(map(int, c)),
                             [float(x) for x in v], n, m, typ=typ)


@pytest.fixture
def engines():
    yield
    options_set(spgemm_engine="auto")


def _check_plus_times(A, B, Sa, Sb):
    C = A.mxm(B, semiring=types.FP32.PLUS_TIMES)
    got = sp.coo_matrix(
        (np.array(C.vals), (np.array(C.rows), np.array(C.cols))),
        shape=(A.nrows, B.ncols)).tocsr()
    want = (Sa @ Sb).tocsr()
    # same pattern (scipy prunes explicit zeros; values here are > 0 so
    # patterns agree) and close values
    assert got.nnz == want.nnz
    d = abs(got - want)
    assert d.max() < 1e-3 if d.nnz else True


@pytest.mark.parametrize("engine", ["esc", "dense", "scipy"])
def test_unmasked_plus_times_oracle(engine, engines):
    n = 600
    ra, ca, va = _rand_coo(n, n, 4000, 1)
    rb, cb, vb = _rand_coo(n, n, 4000, 2)
    Sa = sp.coo_matrix((va, (ra, ca)), shape=(n, n)).tocsr()
    Sb = sp.coo_matrix((vb, (rb, cb)), shape=(n, n)).tocsr()
    # huge logical dims force the sparse tier
    A = Matrix.sparse(types.FP32, 10**9, 10**9)
    A._build(ra, ca, va)
    B = Matrix.sparse(types.FP32, 10**9, 10**9)
    B._build(rb, cb, vb)
    options_set(spgemm_engine=engine)
    C = A.mxm(B, semiring=types.FP32.PLUS_TIMES)
    got = sp.coo_matrix(
        (np.array(C.vals), (np.array(C.rows), np.array(C.cols))),
        shape=(n, n)).tocsr()
    want = (Sa @ Sb).tocsr()
    assert got.nnz == want.nnz
    assert abs(got - want).max() < 1e-3


@pytest.mark.parametrize("engine", ["esc", "scipy"])
@pytest.mark.parametrize("sr", ["MIN_PLUS", "MAX_FIRST", "PLUS_SECOND",
                                "TIMES_TIMES"])
def test_unmasked_semirings_esc_vs_scipy(engine, sr, engines):
    n = 300
    ra, ca, va = _rand_coo(n, n, 2500, 3)
    rb, cb, vb = _rand_coo(n, n, 2500, 4)
    A = Matrix.sparse(types.FP32, 10**9, 10**9)
    A._build(ra, ca, va)
    B = Matrix.sparse(types.FP32, 10**9, 10**9)
    B._build(rb, cb, vb)
    semiring = getattr(types.FP32, sr)
    options_set(spgemm_engine="scipy")
    C0 = A.mxm(B, semiring=semiring)
    options_set(spgemm_engine=engine)
    C1 = A.mxm(B, semiring=semiring)
    assert C0.nvals == C1.nvals
    assert np.array_equal(np.array(C0.rows), np.array(C1.rows))
    assert np.array_equal(np.array(C0.cols), np.array(C1.cols))
    assert np.allclose(np.array(C0.vals), np.array(C1.vals),
                       rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("engine", ["esc", "dense"])
def test_unmasked_lor_land_bool(engine, engines):
    n = 200
    ra, ca, va = _rand_coo(n, n, 1500, 5)
    rb, cb, vb = _rand_coo(n, n, 1500, 6)
    A = Matrix.sparse(types.BOOL, 10**9, 10**9)
    A._build(ra, ca, np.ones(len(ra), bool))
    B = Matrix.sparse(types.BOOL, 10**9, 10**9)
    B._build(rb, cb, np.ones(len(rb), bool))
    options_set(spgemm_engine=engine)
    C = A.mxm(B, semiring=types.BOOL.LOR_LAND)
    Sa = sp.coo_matrix((np.ones(len(ra)), (ra, ca)), shape=(n, n)).tocsr()
    Sb = sp.coo_matrix((np.ones(len(rb)), (rb, cb)), shape=(n, n)).tocsr()
    want = ((Sa @ Sb) > 0).tocoo()
    assert C.nvals == want.nnz
    assert all(bool(x) for x in np.array(C.vals))


def test_esc_explicit_zero_preserved(engines):
    # cancellation: 1*1 + (-1)*1 = 0 must stay a stored entry (the
    # scipy path needs a re-fill; ESC keeps it naturally)
    A = Matrix.sparse(types.FP32, 10**9, 10**9)
    A._build(np.array([5, 5]), np.array([1, 2]),
             np.array([1.0, -1.0], np.float32))
    B = Matrix.sparse(types.FP32, 10**9, 10**9)
    B._build(np.array([1, 2]), np.array([7, 7]),
             np.array([1.0, 1.0], np.float32))
    options_set(spgemm_engine="esc")
    C = A.mxm(B, semiring=types.FP32.PLUS_TIMES)
    assert C.nvals == 1
    assert list(C.rows) == [5] and list(C.cols) == [7]
    assert float(list(C.vals)[0]) == 0.0


def test_esc_heavy_multiplicity(engines):
    # one inner index shared by many A entries (the restart-heavy case
    # for the windowed gather) + empty B rows interleaved
    rng = np.random.RandomState(7)
    m = 500
    ra = np.arange(m, dtype=np.int64)
    ca = np.zeros(m, np.int64)          # all of A's entries in column 0
    va = rng.rand(m).astype(np.float32)
    rb = np.concatenate([np.zeros(40, np.int64), [3], [9]])
    cb = np.concatenate([np.arange(40, dtype=np.int64), [2], [4]])
    vb = rng.rand(len(rb)).astype(np.float32)
    o = np.argsort(rb * 10**6 + cb, kind="stable")
    rb, cb, vb = rb[o], cb[o], vb[o]
    A = Matrix.sparse(types.FP32, 10**9, 10**9)
    A._build(ra, ca, va)
    B = Matrix.sparse(types.FP32, 10**9, 10**9)
    B._build(rb, cb, vb)
    options_set(spgemm_engine="esc")
    C = A.mxm(B, semiring=types.FP32.PLUS_TIMES)
    Sa = sp.coo_matrix((va, (ra, ca)), shape=(m, 10)).tocsr()
    Sb = sp.coo_matrix((vb, (rb, cb)), shape=(10, 50)).tocsr()
    want = (Sa @ Sb).tocoo()
    got = sp.coo_matrix(
        (np.array(C.vals), (np.array(C.rows), np.array(C.cols))),
        shape=(m, 50))
    assert abs(got.tocsr() - want.tocsr()).max() < 1e-4
    assert got.nnz == want.nnz


def test_dense_tier_int_counts(engines):
    # PLUS_PAIR structural counts through the dense tier
    n = 150
    ra, ca, _ = _rand_coo(n, n, 1200, 8)
    A = Matrix.sparse(types.INT64, 10**9, 10**9)
    A._build(ra, ca, np.ones(len(ra), np.int64))
    options_set(spgemm_engine="dense")
    C = A.mxm(A, semiring=types.INT64.PLUS_PAIR)
    Sa = sp.coo_matrix((np.ones(len(ra)), (ra, ca)), shape=(n, n)).tocsr()
    want = (Sa @ Sa).tocsr()
    got = sp.coo_matrix(
        (np.array(C.vals).astype(np.float64),
         (np.array(C.rows), np.array(C.cols))), shape=(n, n)).tocsr()
    assert got.nnz == want.nnz
    assert abs(got - want).max() == 0
