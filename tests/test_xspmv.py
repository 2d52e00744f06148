"""Gather-free SpMV pipeline (core/xspmv.py) vs a scipy-based oracle,
plus fused-algorithm equivalence between engines."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

import pygraphblas_tpu.core.xspmv as X
from pygraphblas_tpu import types, Matrix, fused, algorithms
from pygraphblas_tpu.base import options_set


_ADD = {"PLUS": np.add, "MIN": np.minimum, "MAX": np.maximum}
_MUL = {"TIMES": lambda a, b: a * b, "PLUS": lambda a, b: a + b,
        "FIRST": lambda a, b: a, "SECOND": lambda a, b: b,
        "PAIR": lambda a, b: np.ones_like(a)}


def _rand_coo(n_r, n_c, nnz, seed):
    rng = np.random.RandomState(seed)
    r = rng.randint(0, n_r, nnz)
    c = rng.randint(0, n_c, nnz)
    _, ui = np.unique(r.astype(np.int64) * n_c + c, return_index=True)
    r, c = r[ui], c[ui]
    v = rng.rand(len(r)).astype(np.float32) + 0.5
    return r, c, v, rng


def _oracle(r, c, v, n_r, n_c, x, addf, mulf):
    A = sp.coo_matrix((v, (r, c)), shape=(n_r, n_c)).tocsr()
    want = np.zeros(n_r, np.float32)
    mask = np.zeros(n_r, bool)
    for i in range(n_r):
        s, e = A.indptr[i], A.indptr[i + 1]
        if s == e:
            continue
        prods = mulf(A.data[s:e], x[A.indices[s:e]])
        acc = prods[0]
        for p in prods[1:]:
            acc = addf(acc, p)
        want[i] = acc
        mask[i] = True
    return want, mask


@pytest.mark.parametrize("sem_name,n_r,n_c,nnz", [
    ("PLUS_TIMES", 300, 400, 5000),
    ("MIN_PLUS", 1000, 1000, 30000),
    ("MAX_FIRST", 50, 60, 300),
    ("PLUS_SECOND", 512, 512, 8000),
    ("PLUS_PAIR", 200, 200, 2000),
])
def test_xspmv_oracle(sem_name, n_r, n_c, nnz, monkeypatch):
    monkeypatch.setattr(X, "MIN_NNZ", 1)
    r, c, v, rng = _rand_coo(n_r, n_c, nnz, hash(sem_name) % 1000)
    sem = getattr(types.FP32, sem_name)
    assert X.supported(sem, np.float32, len(r))
    plan = X.XSpmvPlan.build(r, c, v, n_r, n_c, np.float32)
    x = rng.rand(n_c).astype(np.float32)
    y, present = X.xspmv(plan, jnp.asarray(x), sem, np.float32)
    y, present = np.asarray(y), np.asarray(present)
    want, mask = _oracle(r, c, v, n_r, n_c, x,
                         _ADD[sem.add_monoid.binaryop.op],
                         _MUL[sem.mul_op.op])
    assert np.array_equal(present, mask)
    assert np.allclose(y[mask], want[mask], rtol=1e-5)


@pytest.mark.parametrize("sem_name", ["PLUS_FIRST", "PLUS_SECOND",
                                      "MIN_FIRST", "MAX_SECOND"])
def test_xspmv_flip_mul_oracle(sem_name, monkeypatch):
    """flip_mul=True (the vxm operand order) must swap FIRST/SECOND
    roles in the fast paths too (advisor round-2 high finding)."""
    monkeypatch.setattr(X, "MIN_NNZ", 1)
    n = 700
    r, c, v, rng = _rand_coo(n, n, 9000, 77)
    sem = getattr(types.FP32, sem_name)
    plan = X.XSpmvPlan.build(r, c, v, n, n, np.float32)
    x = rng.rand(n).astype(np.float32)
    y, present = X.xspmv(plan, jnp.asarray(x), sem, np.float32,
                         flip_mul=True)
    y, present = np.asarray(y), np.asarray(present)
    mulf = _MUL[sem.mul_op.op]
    want, mask = _oracle(r, c, v, n, n, x,
                         _ADD[sem.add_monoid.binaryop.op],
                         lambda a, b: mulf(b, a))
    assert np.array_equal(present, mask)
    assert np.allclose(y[mask], want[mask], rtol=1e-5)


def test_vxm_first_second_xspmv(monkeypatch):
    """End-to-end vxm with PLUS_FIRST/PLUS_SECOND through the xspmv
    engine matches the csr8 engine (advisor repro, reduced size)."""
    monkeypatch.setattr(X, "MIN_NNZ", 1)
    from pygraphblas_tpu import Vector
    n = 800
    r, c, v, rng = _rand_coo(n, n, 12000, 31)
    A = Matrix.from_lists(list(r), list(c), list(np.float32(v)), n, n,
                          typ=types.FP32)
    x = Vector.from_lists(list(range(n)),
                          list(rng.rand(n).astype(np.float32)), n,
                          typ=types.FP32)
    for sem in (types.FP32.PLUS_FIRST, types.FP32.PLUS_SECOND):
        options_set(spmv_engine="csr8")
        try:
            want = x.vxm(A, semiring=sem)
            options_set(spmv_engine="xspmv")
            got = x.vxm(A, semiring=sem)
        finally:
            options_set(spmv_engine="auto")
        assert np.allclose(
            np.asarray(want._dense_pair(np.float32)[0]),
            np.asarray(got._dense_pair(np.float32)[0]), rtol=1e-5), sem.name


def test_fused_pagerank_engines_agree(monkeypatch):
    monkeypatch.setattr(X, "MIN_NNZ", 1)
    r, c, v, _ = _rand_coo(500, 500, 4000, 9)
    v = np.ones_like(v)
    A = Matrix.from_lists(list(r), list(c), list(np.float32(v)), 500, 500,
                          typ=types.FP32)
    options_set(spmv_engine="csr8")
    try:
        pr1 = fused.pagerank(A)
        A._ell_c.pop("fused_pr_x", None)
        options_set(spmv_engine="xspmv")
        pr2 = fused.pagerank(A)
    finally:
        options_set(spmv_engine="auto")
    v1 = np.asarray(pr1._dense_pair(np.float32)[0])
    v2 = np.asarray(pr2._dense_pair(np.float32)[0])
    assert np.allclose(v1, v2, atol=1e-5)


def test_eager_mxv_engines_agree(monkeypatch):
    monkeypatch.setattr(X, "MIN_NNZ", 1)
    from pygraphblas_tpu import Vector
    r, c, v, rng = _rand_coo(300, 300, 4000, 21)
    A = Matrix.from_lists(list(r), list(c), list(np.float32(v)), 300, 300,
                          typ=types.FP32)
    x = Vector.from_lists(list(range(300)),
                          list(rng.rand(300).astype(np.float32)), 300,
                          typ=types.FP32)
    options_set(spmv_engine="csr8")
    try:
        y1 = A.mxv(x)
        options_set(spmv_engine="xspmv")
        y2 = A.mxv(x)
        y3 = x.vxm(A)
        options_set(spmv_engine="csr8")
        y4 = x.vxm(A)
    finally:
        options_set(spmv_engine="auto")
    assert np.allclose(np.asarray(y1._dense_pair(np.float32)[0]),
                       np.asarray(y2._dense_pair(np.float32)[0]), rtol=1e-5)
    assert np.allclose(np.asarray(y3._dense_pair(np.float32)[0]),
                       np.asarray(y4._dense_pair(np.float32)[0]), rtol=1e-5)


def test_fused_bfs_engines_agree(monkeypatch):
    monkeypatch.setattr(X, "MIN_NNZ", 1)
    r, c, v, _ = _rand_coo(600, 600, 5000, 13)
    A = Matrix.from_lists(list(r), list(c), list(np.float32(v)), 600, 600,
                          typ=types.FP32)
    options_set(spmv_engine="csr8")
    try:
        l1 = fused.bfs_level(A, 0)
        A._ell_c.pop("fused_bfs_x", None)
        options_set(spmv_engine="xspmv")
        l2 = fused.bfs_level(A, 0)
    finally:
        options_set(spmv_engine="auto")
    assert l1.iseq(l2)


def test_fused_sssp_engines_agree(monkeypatch):
    monkeypatch.setattr(X, "MIN_NNZ", 1)
    r, c, v, _ = _rand_coo(400, 400, 3000, 11)
    A = Matrix.from_lists(list(r), list(c), list(np.float32(v)), 400, 400,
                          typ=types.FP32)
    options_set(spmv_engine="csr8")
    try:
        d1 = fused.sssp(A, 0)
        A._ell_c.pop("fused_sssp_x", None)
        options_set(spmv_engine="xspmv")
        d2 = fused.sssp(A, 0)
    finally:
        options_set(spmv_engine="auto")
    assert d1.iseq(d2) or np.allclose(
        np.asarray(d1._dense_pair(np.float32)[0]),
        np.asarray(d2._dense_pair(np.float32)[0]), rtol=1e-5)
