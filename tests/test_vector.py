import pytest
import numpy as np

from pygraphblas_tpu import (
    Matrix,
    Vector,
    Scalar,
    Accum,
    types,
    descriptor,
    NoValue,
)
from pygraphblas_tpu.base import InvalidIndex


def mkv():
    return Vector.from_lists([0, 1, 2], [10, 20, 30])


def test_constructors():
    v = Vector.sparse(types.INT64, 5)
    assert v.size == 5
    assert v.nvals == 0
    d = Vector.dense(types.FP32, 3, fill=1.5)
    assert d.nvals == 3
    i = Vector.iso(7, 4)
    assert i[3] == 7
    l = Vector.from_list([1, 2, 3])
    assert l.to_lists() == [[0, 1, 2], [1, 2, 3]]
    n = Vector.from_1_to_n(4)
    assert n[3] == 4
    p = Vector.from_lists([0, 2])
    assert p.type is types.BOOL


def test_unbounded_vector():
    from pygraphblas_tpu import GxB_INDEX_MAX

    v = Vector.sparse(types.FP64)
    assert v.size == GxB_INDEX_MAX
    v[98765432101] = 2.5
    assert v[98765432101] == 2.5
    assert repr(v) == "<Vector(FP64, nvals: 1)>"


def test_element_access():
    v = mkv()
    assert v[1] == 20
    with pytest.raises(InvalidIndex):
        v[99]
    del v[1]
    with pytest.raises(NoValue):
        v[1]
    assert 0 in v
    assert 1 not in v
    assert v.get(1, "dflt") == "dflt"


def test_dup_clear_resize():
    v = mkv()
    d = v.dup()
    assert d.iseq(v)
    d[0] = 99
    assert v[0] == 10
    v.resize(2)
    assert v.size == 2
    assert v.nvals == 2
    v.clear()
    assert v.nvals == 0


def test_eadd_emult():
    u = Vector.from_lists([0, 1], [1, 2], 3)
    w = Vector.from_lists([1, 2], [10, 20], 3)
    assert u.eadd(w).to_lists() == [[0, 1, 2], [1, 12, 20]]
    assert u.emult(w).to_lists() == [[1], [20]]
    assert u.eadd(w, types.INT64.MAX).to_lists() == [[0, 1, 2], [1, 10, 20]]
    assert u.emult(w, "+").to_lists() == [[1], [12]]


def test_operator_sugar():
    v = mkv()
    assert (v + v)[0] == 20
    assert (v * v)[0] == 100
    assert (v - 1)[0] == 9
    assert (1 + v)[0] == 11
    assert (2 * v)[2] == 60
    assert (-v)[0] == -10
    assert abs(-v)[0] == 10
    w = v.dup()
    w += v
    assert w[0] == 20
    assert (v | v)[0] == 10
    assert (v & v)[0] == 10


def test_vxm_and_mask():
    m = Matrix.from_lists([0, 1, 2], [1, 2, 0], [1, 2, 3])
    v = Vector.from_lists([0, 1, 2], [2, 3, 4])
    o = v.vxm(m)
    assert o.to_lists() == [[0, 1, 2], [12, 2, 6]]
    del o[1]
    o2 = v.vxm(m, mask=o)
    assert o2.to_lists() == [[0, 2], [12, 6]]
    # complement mask
    o3 = v.vxm(m, mask=o, desc=descriptor.C)
    assert o3.to_lists()[0] == [1]


def test_vxm_accum_and_t1():
    m = Matrix.from_lists([0, 1, 2], [1, 2, 0], [1, 2, 3])
    v = Vector.from_lists([0, 1, 2], [2, 3, 4])
    o = v.dup()
    v.vxm(m, accum=types.INT64.plus, out=o)
    assert o.to_lists() == [[0, 1, 2], [14, 5, 10]]
    # T1 transposes the matrix: vxm(A, T1) == mxv(A)
    assert v.vxm(m, desc=descriptor.T1).iseq(m.mxv(v))


def test_reduce():
    v = mkv()
    assert v.reduce_int() == 60
    assert v.reduce() == 60
    assert v.reduce_float() == 60.0
    assert v.max() == 30
    assert v.min() == 10
    b = Vector.from_lists([0, 1], [False, True])
    assert b.max() is True
    assert b.min() is False
    assert b.reduce_bool() is True
    f = Vector.from_lists([0, 1], [1.5, -2.5])
    assert f.max() == 1.5
    assert f.min() == -2.5
    with pytest.raises(TypeError):
        Vector.from_lists([0], [1j]).max()
    with pytest.raises(TypeError):
        Vector.from_lists([0], [1j]).min()


def test_apply_select():
    v = mkv()
    assert v.apply(types.INT64.AINV)[0] == -10
    assert v.apply_first(100, types.INT64.MINUS)[0] == 90
    assert v.apply_second(types.INT64.MINUS, 100)[0] == -90
    w = Vector.from_lists([0, 1, 2], [-1, 0, 1])
    assert w.select(">0").nvals == 1
    assert w.select("<=0").nvals == 2
    assert w.select("min").to_lists() == [[0], [-1]]
    assert w.select("max").to_lists() == [[2], [1]]
    assert w.nonzero().nvals == 2


def test_pattern():
    v = mkv()
    p = v.pattern()
    assert p.type is types.BOOL
    assert p.nvals == 3
    assert v.S.iseq(p)


def test_assign():
    v = Vector.sparse(types.INT64, 4)
    v[:] = 3
    assert v.nvals == 4
    v.clear()
    v[1:2] = 5  # stop-inclusive
    assert v.to_lists() == [[1, 2], [5, 5]]
    v2 = Vector.sparse(types.INT64, 4)
    v2.assign(Vector.from_list([1, 2]), slice(1, 2))
    assert v2.to_lists() == [[1, 2], [1, 2]]
    v3 = Vector.sparse(types.INT64, 3)
    mask = Vector.from_lists([0, 2], [True, True], 3)
    v3.assign_scalar(9, mask=mask)
    assert v3.to_lists() == [[0, 2], [9, 9]]
    v4 = Vector.sparse(types.INT64, 3)
    v4[mask] = 7
    assert v4.to_lists() == [[0, 2], [7, 7]]
    v4[[0, 1]] = 1
    assert v4[1] == 1


def test_extract():
    v = mkv()
    e = v.extract(slice(1, 2))
    assert e.to_lists() == [[0, 1], [20, 30]]
    e2 = v[[2, 0]]
    assert e2.to_lists() == [[0, 1], [30, 10]]
    e3 = v[0:2:2]
    assert e3.to_lists() == [[0, 1], [10, 30]]
    e4 = v[2:0:-1]
    assert e4.to_lists() == [[0, 1, 2], [30, 20, 10]]


def test_compare():
    v = Vector.from_lists([0, 1, 2], [-5, 0, 7])
    assert (v > 0).nvals == 1
    assert (v >= 0)[1] is True
    u = Vector.from_lists([0, 1], [1, 2])
    w = Vector.from_lists([0, 1], [1, 3])
    assert (u == w)[0] is True
    assert (u == w)[1] is False


def test_iseq_types():
    v = mkv()
    assert not v.iseq(v.apply(types.FP32.ONE))
    assert v.iseq(v.dup(), eq_op=types.INT64.EQ)


def test_to_string_golden():
    v = Vector.from_lists([0, 2], [1, 2])
    assert v.to_string() == "0| 1\n1|\n2| 2"


def test_bitwise_ops():
    u = Vector.from_lists([0, 1], [0b1100, 0b1010], typ=types.UINT8)
    w = Vector.from_lists([0, 1], [0b1010, 0b0110], typ=types.UINT8)
    assert u.emult(w, types.UINT8.BOR).to_lists()[1] == [0b1110, 0b1110]
    assert u.emult(w, types.UINT8.BAND).to_lists()[1] == [0b1000, 0b0010]
    assert u.emult(w, types.UINT8.BXOR).to_lists()[1] == [0b0110, 0b1100]


def test_iteration_exports():
    v = mkv()
    assert list(iter(v)) == [(0, 10), (1, 20), (2, 30)]
    assert list(v.I) == [0, 1, 2]
    assert list(v.V) == [10, 20, 30]
    assert v.npI.dtype == np.uint64
    assert list(v.npV) == [10, 20, 30]
    i, vals = v.to_arrays()
    assert list(i) == [0, 1, 2]


def test_random_seeded():
    a = Vector.random(types.FP64, 10, 20, seed=7)
    b = Vector.random(types.FP64, 10, 20, seed=7)
    assert a.iseq(b)


def test_vxm_non_commutative_sparse_matches_dense():
    """vxm must compute mul(x_k, A_kj) — operand roles caught wrong on
    the sparse tier in the round-2 review."""
    from pygraphblas_tpu.base import config

    M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [10, 20, 30])
    v = Vector.from_list([2, 3, 4])
    dense = v.vxm(M, types.INT64.PLUS_SECOND).to_lists()
    old = config.bitmap_max_cells
    config.bitmap_max_cells = 1
    try:
        sparse = v.vxm(M, types.INT64.PLUS_SECOND).to_lists()
        sparse_first = v.vxm(M, types.INT64.PLUS_FIRST).to_lists()
        sparse_minus = v.vxm(M, types.INT64.MIN_MINUS).to_lists()
    finally:
        config.bitmap_max_cells = old
    assert sparse == dense == [[0, 1, 2], [30, 10, 20]]
    assert sparse_first == [[0, 1, 2], [4, 2, 3]]
    dense_minus = v.vxm(M, types.INT64.MIN_MINUS).to_lists()
    assert sparse_minus == dense_minus


def test_sparsity_knobs():
    """Parity knobs (reference vector.py:402-447)."""
    v = Vector.from_list([1, 2, 3])
    assert v.sparsity == 15  # GxB_AUTO_SPARSITY
    v.sparsity = 4
    assert v.sparsity == 4
    v.hyper_switch = 0.25
    assert v.hyper_switch == 0.25
    assert Vector.from_list([1, 2, 3]).sparsity_status == 8  # full
    assert Vector.from_lists([0, 2], [7, 9], 4).sparsity_status == 4
    assert Vector.sparse(types.INT64, 10**12).sparsity_status == 1
    assert Vector.iso(5, 10**12).sparsity_status == 8


def test_cast_bitmap_and_coo():
    v = Vector.from_lists([0, 2, 5], [1, 2, 3], 8)
    w = v.cast(types.FP64)
    assert w.type is types.FP64
    assert w.to_lists() == [[0, 2, 5], [1.0, 2.0, 3.0]]
    h = Vector.sparse(types.INT64, 10**8)
    h[123] = 7
    hc = h.cast(types.FP32)
    assert hc.type is types.FP32 and hc.to_lists() == [[123], [7.0]]


# ---------------------------------------------------------------------------
# scalar-broadcast operator matrix + error paths (reference
# tests/test_vector.py:414-560, expressed as parametrized tables)
# ---------------------------------------------------------------------------

import operator as _op

_SCALAR_OP_CASES = [
    # (values, op, scalar, reflected, expected)
    ([5, 1], _op.add, 3, False, [8, 4]),
    ([5, 1], _op.add, 3, True, [8, 4]),
    ([5, 1], _op.sub, 3, False, [2, -2]),
    ([5, 1], _op.sub, 3, True, [-2, 2]),
    ([5, 1], _op.mul, 3, False, [15, 3]),
    ([5, 1], _op.mul, 3, True, [15, 3]),
    ([15, 3], _op.truediv, 3, False, [5, 1]),
    ([3, 5], _op.truediv, 15, True, [5, 3]),
]


@pytest.mark.parametrize("vals,op,s,reflected,want", _SCALAR_OP_CASES)
def test_scalar_broadcast_ops(vals, op, s, reflected, want):
    v = Vector.from_lists([0, 1], vals)
    w = op(s, v) if reflected else op(v, s)
    assert w.to_lists() == [[0, 1], want]


@pytest.mark.parametrize("iop,vals,s,want", [
    (_op.iadd, [5, 1], 3, [8, 4]),
    (_op.isub, [5, 1], 3, [2, -2]),
    (_op.imul, [5, 1], 3, [15, 3]),
    (_op.itruediv, [15, 3], 3, [5, 1]),
])
def test_scalar_inplace_ops(iop, vals, s, want):
    v = Vector.from_lists([0, 1], vals)
    v = iop(v, s)
    assert v.to_lists() == [[0, 1], want]


def test_bitwise_eadd():
    u = Vector.from_lists([1], [5], typ=types.UINT64)
    w = u.eadd(Vector.from_lists([1], [9], typ=types.UINT64),
               u.type.BOR)
    assert w[1] == 5 | 9
    w = u.eadd(Vector.from_lists([1], [9], typ=types.UINT64),
               u.type.BAND)
    assert w[1] == 5 & 9
    w = u.eadd(Vector.from_lists([1], [9], typ=types.UINT64),
               u.type.BXOR)
    assert w[1] == 5 ^ 9


def test_vector_wait_assign_all():
    v = Vector.sparse(types.UINT8, 10)
    v[:] = 1
    v.wait()
    assert v.nvals == 10 and v[7] == 1


def test_vector_delitem_and_errors():
    v = Vector.from_lists([0, 1], [4, 2])
    assert len(v) == 2
    del v[0]
    assert len(v) == 1 and v[1] == 2
    with pytest.raises(TypeError):
        del v[""]


def test_apply_first_second_scalar_operand():
    from pygraphblas_tpu import Scalar

    m = Vector.from_lists([0, 1], [4, 2])
    assert m.apply_first(2, types.INT8.PLUS).to_lists() == [[0, 1], [6, 4]]
    assert m.apply_first(Scalar.from_value(2),
                         types.INT8.PLUS).to_lists() == [[0, 1], [6, 4]]
    m = Vector.from_lists([0, 1], [5, 1])
    assert m.apply_second(types.INT8.MINUS, 2).to_lists() == [[0, 1], [3, -1]]
    assert m.apply_second(types.INT8.MINUS,
                          Scalar.from_value(2)).to_lists() == [[0, 1], [3, -1]]


def test_strided_slicing_both_directions():
    v = Vector.from_1_to_n(10)
    assert v[1:9:3].iseq(Vector.from_lists([0, 1, 2], [2, 5, 8]))
    assert len(v[1:9:-3]) == 0
    assert v[9:1:-3].iseq(Vector.from_lists([0, 1, 2], [10, 7, 4]))
    assert len(v[9:1:3]) == 0


def test_str_repr_bool_render():
    m = Vector.from_lists([0, 1], [4, 2], typ=types.INT8)
    assert str(m) == "0| 4\n1| 2"
    b = Vector.from_lists([0, 1], [True, True])
    assert str(b) == "0| t\n1| t"
    assert repr(b) == "<Vector(BOOL size: 2, nvals: 2)>"


def test_nonzero_neg_abs_truthiness():
    m = Vector.from_lists([0, 1], [0, 2])
    assert m.nonzero().iseq(Vector.from_lists([1], [2]))
    assert (-m).iseq(Vector.from_lists([0, 1], [0, -2]))
    m2 = Vector.from_lists([0, 1], [0, -2])
    assert abs(m2).iseq(Vector.from_lists([0, 1], [0, 2]))
    m2.clear()
    assert not m2


def test_indexing_error_paths():
    v = Vector.from_list([1, 2, 3])
    with pytest.raises(InvalidIndex):
        v.extract_element(5)
    with pytest.raises(NoValue):
        Vector.from_lists([0], [1], 4).extract_element(2)
    with pytest.raises(TypeError):
        v[object()]


def test_sparsity_control_converts_storage():
    v = Vector.from_lists([0, 2], [7, 9], 5)
    assert v.sparsity_status == 4
    v.sparsity = 1
    assert v._fmt == "coo" and v.sparsity_status == 1
    assert v[2] == 9 and v.nvals == 2
    v.sparsity = 8
    assert v._fmt == "bitmap"
    assert v[0] == 7 and v.nvals == 2
