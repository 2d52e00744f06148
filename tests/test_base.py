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


def test_op_timing_counters():
    import sys
    from pygraphblas_tpu import Matrix, types
    from pygraphblas_tpu.base import options_set, perf_report

    options_set(op_timing=1)
    try:
        A = Matrix.from_lists([0, 1], [1, 0], [1.0, 2.0])
        (A @ A).eadd(A)
        rep = perf_report(reset=True)
        assert rep["Matrix.mxm"][0] >= 1
        assert rep["Matrix.eadd"][0] >= 1
    finally:
        options_set(op_timing=0)


def test_profiler_trace(tmp_path):
    import os
    from pygraphblas_tpu import Matrix
    from pygraphblas_tpu.base import profile_start, profile_stop

    profile_start(str(tmp_path))
    A = Matrix.from_lists([0, 1], [1, 0], [1.0, 2.0])
    _ = A @ A
    profile_stop()
    # a trace directory with at least one event file appeared
    found = any("plugins" in r or f for r, d, f in os.walk(tmp_path))
    assert found
