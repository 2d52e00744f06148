import pytest

from pygraphblas_tpu import types
from pygraphblas_tpu.types import promote, _gb_from_type


def test_name_lookup():
    assert types.Type.gb_from_name("INT64") is types.INT64
    assert types.Type.gb_from_name("int64_t") is types.INT64
    assert types.Type.gb_from_name("FP32") is types.FP32
    assert types.Type.gb_from_name("_Bool") is types.BOOL


def test_gb_from_type():
    assert _gb_from_type(int) is types.INT64
    assert _gb_from_type(float) is types.FP64
    assert _gb_from_type(bool) is types.BOOL
    assert _gb_from_type(complex) is types.FC64
    with pytest.raises(TypeError):
        _gb_from_type(str)


def test_promotion_identity():
    for t in (types.BOOL, types.INT8, types.UINT64, types.FP32, types.FC64):
        assert promote(t, t) is t


def test_promotion_bool_yields_other():
    assert promote(types.BOOL, types.INT8) is types.INT8
    assert promote(types.FP64, types.BOOL) is types.FP64


def test_promotion_order():
    assert promote(types.INT8, types.INT16) is types.INT16
    assert promote(types.INT32, types.UINT64) is types.UINT64
    assert promote(types.INT64, types.FP32) is types.FP32
    assert promote(types.FP32, types.FP64) is types.FP64
    assert promote(types.FP64, types.FC32) is types.FC32
    assert promote(types.FC32, types.FC64) is types.FC64
    assert promote(types.UINT8, types.INT8) is types.INT8
    assert promote(types.UINT16, types.INT16) is types.INT16


def test_default_ops():
    assert types.INT64._default_semiring().name == "PLUS_TIMES_INT64"
    assert types.BOOL._default_semiring().name == "LOR_LAND_BOOL"
    assert types.INT64._default_addop().op == "PLUS"
    assert types.BOOL._default_addop().op == "LOR"
    assert types.BOOL._default_multop().op == "LAND"


def test_format_value():
    assert types.BOOL.format_value(True, 2) == " t"
    assert types.BOOL.format_value(False, 2) == " f"
    assert types.INT64.format_value(42, 3) == " 42"
    assert types.FP64.format_value(1.5, 4, 3) == " 1.5"


def test_default_zero_one():
    assert types.BOOL.default_one is True
    assert types.BOOL.default_zero is False
    assert types.FP32.default_one == 1.0
    assert types.INT64.default_one == 1


def test_tgamma_negative_arguments():
    """TGAMMA must be correct (value and sign) on the negative axis."""
    from scipy.special import gamma as scipy_gamma
    import numpy as np
    from pygraphblas_tpu import Vector, types

    xs = [-2.5, -1.5, -0.5, 0.5, 1.0, 3.0, 4.5]
    v = Vector.from_lists(list(range(len(xs))), xs, typ=types.FP64)
    got = v.apply(types.FP64.TGAMMA).npV
    want = scipy_gamma(np.asarray(xs))
    assert np.allclose(got, want, rtol=1e-5), (got, want)


def test_semiring_registry_count():
    """Registry parity: SuiteSparse documents exactly 1,553 built-in
    semirings (UserGuide 'built-in semirings'; the reference reflects
    them from `lib`, pygraphblas/semiring.py:154).  Our generator must
    produce the same count."""
    from pygraphblas_tpu import semiring as sr

    count = sum(1 for name in dir(sr)
                if isinstance(getattr(sr, name), sr.Semiring))
    assert count == 1553, count
