"""Static Benes permutation primitive (core/perm.py).

Routing correctness is fully exercised on CPU: the staged execution
path (lane gathers / transposes / sublane select) runs the same stage
index arrays the TPU kernels consume."""

import numpy as np
import jax.numpy as jnp
import pytest

from pygraphblas_tpu.core.perm import PermPlan, _choose_shape, _greedy_color


@pytest.mark.parametrize("n", [5, 1000, 16384, 16385, 50000, 300000])
def test_perm_roundtrip(n):
    rng = np.random.RandomState(n)
    src = rng.permutation(n)
    plan = PermPlan.build(src)
    x = np.arange(n, dtype=np.float32) * 2.0 + 1.0
    out = np.asarray(plan.apply(jnp.asarray(x)))
    assert np.array_equal(out, x[src])


def test_perm_identity_and_reverse():
    n = 30000
    for src in [np.arange(n), np.arange(n)[::-1].copy()]:
        plan = PermPlan.build(src)
        x = np.random.RandomState(0).rand(n).astype(np.float32)
        assert np.array_equal(np.asarray(plan.apply(jnp.asarray(x))), x[src])


def test_perm_int_dtype():
    n = 40000
    src = np.random.RandomState(1).permutation(n)
    plan = PermPlan.build(src)
    x = np.arange(n, dtype=np.int32)
    out = np.asarray(plan.apply(jnp.asarray(x)))
    assert np.array_equal(out, x[src])


@pytest.mark.parametrize("n", [1 << 15, 1 << 18, (1 << 18) + 1024])
def test_perm_apply_fold8(n):
    """apply_fold8 folds each consecutive 8-row block of the permuted
    (n//128, 128) view — fused into the final ascend pass on TPU."""
    rng = np.random.RandomState(n % 97)
    src = rng.permutation(n)
    plan = PermPlan.build(src)
    x = rng.rand(n).astype(np.float32)
    out, folded = plan.apply_fold8(jnp.asarray(x), np.float32(0),
                                   lambda a, b: a + b)
    assert folded
    want_full = x[src]
    pad = -n % 1024
    if pad:
        want_full = np.concatenate([want_full, np.zeros(pad, np.float32)])
    want = want_full.reshape(-1, 8, 128).sum(axis=1).reshape(-1)
    got = np.asarray(out)
    assert got.shape[0] >= want.shape[0]
    assert np.allclose(got[:want.shape[0]], want, rtol=1e-6)


def test_choose_shape_bounds():
    for n in [16400, 100000, 1 << 21, 1 << 24]:
        d, s, r0 = _choose_shape(n, 112)
        assert 1 <= s <= 16
        assert r0 == s * 128 ** (d - 1)
        assert r0 * 112 >= n


def test_greedy_color_valid():
    rng = np.random.RandomState(3)
    n_rows, k = 64, 100
    n = n_rows * k
    src = np.repeat(np.arange(n_rows), k)
    dst = rng.permutation(src)
    col = _greedy_color(src, dst, n_rows, rng)
    assert len(np.unique(src * 128 + col)) == n
    assert len(np.unique(dst * 128 + col)) == n
