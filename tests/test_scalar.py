import pytest

from pygraphblas_tpu import Scalar, types


def test_from_value_and_get():
    s = Scalar.from_value(42)
    assert s.type is types.INT64
    assert s[0] == 42
    assert s.nvals == 1
    assert len(s) == 1
    assert bool(s)


def test_from_type_empty():
    s = Scalar.from_type(types.FP64)
    assert s.nvals == 0
    assert not bool(s)
    with pytest.raises(KeyError):
        s[0]


def test_set_clear():
    s = Scalar.from_type(types.FP32)
    s[0] = 1.5
    assert s[0] == 1.5
    s.clear()
    assert s.nvals == 0


def test_dup():
    s = Scalar.from_value(True)
    d = s.dup()
    assert d[0] is True
    assert d.type is types.BOOL
    s.clear()
    assert d.nvals == 1


def test_wait():
    Scalar.from_value(1.0).wait()
