"""Device sort-engine for the COO tier (core/dewise.py): forced-engine
equivalence against the host single-pass merges."""

import numpy as np
import pytest

from pygraphblas_tpu import Matrix, types, options_set, descriptor


@pytest.fixture
def force_device():
    options_set(ewise_engine="device")
    yield
    options_set(ewise_engine="auto")


def _rand_coo(n, nnz, seed, dtype=np.float32, nrows=1 << 40):
    rng = np.random.RandomState(seed)
    r = rng.randint(0, n, nnz)
    c = rng.randint(0, n, nnz)
    key = np.unique(r * n + c)
    r, c = key // n, key % n
    v = (rng.rand(len(r)) * 100).astype(dtype)
    # huge logical dims force the COO tier
    return Matrix.from_lists(list(r), list(c), list(v),
                             nrows=nrows, ncols=nrows,
                             typ=types._gb_from_dtype(np.dtype(dtype)))


def test_device_eadd_matches_host(force_device):
    A = _rand_coo(5000, 3000, 1)
    B = _rand_coo(5000, 3000, 2)
    got = A.eadd(B)
    options_set(ewise_engine="host")
    want = A.eadd(B)
    assert got.iseq(want)


def test_device_emult_matches_host(force_device):
    A = _rand_coo(5000, 3000, 3)
    B = _rand_coo(5000, 3000, 4)
    got = A.emult(B, types.FP32.TIMES)
    options_set(ewise_engine="host")
    want = A.emult(B, types.FP32.TIMES)
    assert got.iseq(want)


def test_device_eadd_int_minus(force_device):
    A = _rand_coo(900, 700, 5, np.int64)
    B = _rand_coo(900, 700, 6, np.int64)
    got = A.eadd(B, types.INT64.MINUS)
    options_set(ewise_engine="host")
    want = A.eadd(B, types.INT64.MINUS)
    assert got.iseq(want)


def test_device_emult_bool_comparator(force_device):
    A = _rand_coo(900, 700, 7, np.int32)
    B = _rand_coo(900, 700, 8, np.int32)
    got = A.emult(B, types.INT32.GT, cast=types.BOOL)
    options_set(ewise_engine="host")
    want = A.emult(B, types.INT32.GT, cast=types.BOOL)
    assert got.iseq(want)


def test_device_eadd_masked(force_device):
    A = _rand_coo(800, 500, 9)
    B = _rand_coo(800, 500, 10)
    M = _rand_coo(800, 400, 11).pattern()
    got = A.eadd(B, mask=M)
    options_set(ewise_engine="host")
    want = A.eadd(B, mask=M)
    assert got.iseq(want)


def test_device_select_matches_host(force_device):
    A = _rand_coo(5000, 4000, 12)
    got = A.select(">", 50.0)
    options_set(ewise_engine="host")
    want = A.select(">", 50.0)
    assert got.iseq(want)


def test_device_select_tril(force_device):
    A = _rand_coo(2000, 1500, 13)
    got = A.tril()
    options_set(ewise_engine="host")
    want = A.tril()
    assert got.iseq(want)


def test_device_engine_used(force_device):
    """The forced engine actually routes through dewise (burble probe)."""
    import pygraphblas_tpu.core.dewise as dw

    calls = []
    orig = dw.ewise

    def probe(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    dw.ewise, old = probe, orig
    try:
        A = _rand_coo(600, 400, 14)
        B = _rand_coo(600, 400, 15)
        A.eadd(B)
    finally:
        dw.ewise = old
    assert calls, "device engine was not used under ewise_engine='device'"


def test_auto_threshold_respects_min():
    """auto keeps small inputs on the host merge path."""
    import pygraphblas_tpu.core.dewise as dw

    calls = []
    orig = dw.ewise

    def probe(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    dw.ewise = probe
    try:
        A = _rand_coo(600, 400, 16)
        B = _rand_coo(600, 400, 17)
        A.eadd(B)
    finally:
        dw.ewise = orig
    assert not calls


def test_device_vector_eadd(force_device):
    from pygraphblas_tpu import Vector

    rng = np.random.RandomState(20)
    n = 1 << 45  # huge logical dim -> COO tier
    ia = np.unique(rng.randint(0, 6000, 2500))
    ib = np.unique(rng.randint(0, 6000, 2500))
    u = Vector.from_lists(list(ia), list(rng.rand(len(ia))), size=n)
    w = Vector.from_lists(list(ib), list(rng.rand(len(ib))), size=n)
    got = u.eadd(w)
    options_set(ewise_engine="host")
    want = u.eadd(w)
    assert got.iseq(want)
