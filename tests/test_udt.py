"""User-defined operator and type tests.

The log-semiring mxm numeric golden is the UDF acceptance case (the same
values as the reference's tests/test_udt.py:125-140, which exercises the
numba-cfunc path there; here user ops are plain JAX-traceable functions).
"""

from math import log, exp

import jax.numpy as jnp
from numpy.testing import assert_array_almost_equal

from pygraphblas_tpu import Matrix, Vector, Accum, types
from pygraphblas_tpu.binaryop import binary_op
from pygraphblas_tpu.types import FP32


def test_log_semiring():
    class Log32(FP32):
        @binary_op(FP32)
        def PLUS(x, y):
            return x + jnp.log1p(jnp.exp(y - x))

        @binary_op(FP32)
        def TIMES(x, y):
            return x + y

        @classmethod
        def _from_value(cls, value):
            return log(value)

        @classmethod
        def _to_value(cls, data):
            return exp(data)

    A = Matrix.sparse(Log32, 6, 6)
    A[0, 1] = 1 / 9.0
    A[0, 3] = 1 / 3.0
    A[1, 2] = 1 / 8.0
    A[3, 4] = 1 / 6.0
    A[3, 5] = 1 / 1.0
    A[4, 2] = 1 / 4.0
    A[1, 5] = 1 / 7.0
    A[5, 4] = 1 / 2.0

    Log32_monoid = Log32.new_monoid(Log32.PLUS, Log32.default_one)
    Log32_semiring = Log32.new_semiring(Log32_monoid, Log32.TIMES)

    with Log32_semiring:
        B = A @ A

    assert_array_almost_equal(
        B.to_lists(),
        [
            [0, 0, 0, 1, 3, 3, 5],
            [2, 4, 5, 4, 2, 4, 2],
            [
                0.01388888825858143,
                0.055555553245953966,
                0.34920633498203557,
                0.0714285835851032,
                0.041666665602164574,
                0.49999999904767284,
                0.12499999928575464,
            ],
        ],
    )


def test_user_monoid_reduce():
    @binary_op(types.FP64)
    def smoothmax(x, y):
        return jnp.log(jnp.exp(x) + jnp.exp(y))

    m = types.FP64.new_monoid(smoothmax, 0.0)
    v = Vector.from_list([1.0, 2.0, 3.0])
    got = v.reduce(m)
    expected = log(exp(log(exp(1.0) + exp(2.0))) + exp(3.0))
    assert abs(got - expected) < 1e-10


def test_user_semiring_mxv():
    @binary_op(types.FP64)
    def take_max(x, y):
        return jnp.maximum(x, y)

    @binary_op(types.FP64)
    def mul_plus1(x, y):
        return x * y + 1

    mon = types.FP64.new_monoid(take_max, float("-inf"))
    sr = types.FP64.new_semiring(mon, mul_plus1)
    A = Matrix.from_lists([0, 0, 1], [0, 1, 1], [2.0, 3.0, 4.0], 2, 2)
    x = Vector.from_list([10.0, 20.0])
    y = A.mxv(x, semiring=sr)
    # y[0] = max(2*10+1, 3*20+1) = 61; y[1] = 4*20+1 = 81
    assert y.to_lists() == [[0, 1], [61.0, 81.0]]
