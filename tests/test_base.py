from pygraphblas_tpu import options_get, options_set
from pygraphblas_tpu.base import _build_range, IndexSet


def test_options_roundtrip():
    opts = options_get()
    assert opts["burble"] == 0
    try:
        options_set(nthreads=4, chunk=1024.0, burble=1, hyper_switch=0.1,
                    bitmap_switch=[0.1] * 8, format=1)
        o2 = options_get()
        assert o2["nthreads"] == 4
        assert o2["chunk"] == 1024.0
        assert o2["burble"] == 1
        assert o2["hyper_switch"] == 0.1
        assert o2["bitmap_switch"] == [0.1] * 8
        assert o2["format"] == 1
    finally:
        options_set(**opts)


def test_build_range_all():
    r = _build_range(None, 9)
    assert r.kind == IndexSet.ALL
    assert list(r.indices(4)) == [0, 1, 2, 3]
    r = _build_range(slice(None, None, None), 9)
    assert r.kind == IndexSet.ALL


def test_build_range_list():
    r = _build_range([3, 1, 4], 9)
    assert r.kind == IndexSet.LIST
    assert r.size == 3
    assert list(r.indices(10)) == [3, 1, 4]


def test_build_range_inclusive_stop():
    # GraphBLAS slices are stop-INCLUSIVE
    r = _build_range(slice(1, 3), 9)
    assert r.kind == IndexSet.RANGE
    assert r.size == 3
    assert list(r.indices(10)) == [1, 2, 3]


def test_build_range_stride():
    r = _build_range(slice(0, 6, 2), 9)
    assert r.kind == IndexSet.STRIDE
    assert list(r.indices(10)) == [0, 2, 4, 6]
    assert r.size == 4


def test_build_range_backwards():
    r = _build_range(slice(6, 0, -2), 9)
    assert r.kind == IndexSet.BACKWARDS
    assert list(r.indices(10)) == [6, 4, 2, 0]
    assert r.size == 4


def test_build_range_defaults():
    r = _build_range(slice(2, None), 9)
    assert list(r.indices(10)) == list(range(2, 10))
    r = _build_range(slice(None, 2), 9)
    assert list(r.indices(10)) == [0, 1, 2]
