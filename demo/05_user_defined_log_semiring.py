"""User-defined operators: the log-semiring.

Products of probabilities underflow; the log-semiring computes in log
space with PLUS = log-add-exp and TIMES = +.  User ops here are plain
JAX-traceable Python functions (the TPU-native replacement for the
reference's numba-cfunc pathway, reference `Log-Semiring.ipynb` and
binaryop.py:137-191).

Run: python demo/05_user_defined_log_semiring.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from math import exp, log  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pygraphblas_tpu import Matrix, types  # noqa: E402
from pygraphblas_tpu.binaryop import binary_op  # noqa: E402
from pygraphblas_tpu.types import FP32  # noqa: E402


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


# transition probabilities of a tiny Markov chain
A = Matrix.sparse(Log32, 4, 4)
A[0, 1] = 0.5
A[0, 2] = 0.5
A[1, 3] = 0.25
A[2, 3] = 0.125

monoid = Log32.new_monoid(Log32.PLUS, Log32.default_one)
semiring = Log32.new_semiring(monoid, Log32.TIMES)

with semiring:
    P2 = A @ A  # two-step path probabilities, summed in log space

print("two-step probabilities (stored in log space, shown as probs):")
print("P(0 -> 3 in 2 steps) =", P2[0, 3])
assert abs(P2[0, 3] - (0.5 * 0.25 + 0.5 * 0.125)) < 1e-6
print("OK")
