"""Monotone windowed gather (core/mono.py)."""

import numpy as np
import jax.numpy as jnp

from pygraphblas_tpu.core.mono import MonoPlan, mono_gather


def test_plain_with_invalid():
    rng = np.random.RandomState(3)
    src_n = 5000
    idx = np.sort(rng.randint(0, src_n, 1000))
    idx[::7] = -1
    plan = MonoPlan.build(idx, src_n)
    src = jnp.asarray(rng.rand(src_n).astype(np.float32))
    out = np.asarray(mono_gather(plan, src, 0.0)).reshape(-1)[:1000]
    want = np.where(idx >= 0, np.asarray(src)[np.clip(idx, 0, None)], 0.0)
    assert np.allclose(out, want)


def test_fused_mul():
    rng = np.random.RandomState(4)
    src_n = 3000
    idx = np.sort(rng.randint(0, src_n, 2000))
    plan = MonoPlan.build(idx, src_n)
    src = jnp.asarray(rng.rand(src_n).astype(np.float32))
    vals = jnp.asarray(rng.rand(plan.S * 128).astype(np.float32))
    out = np.asarray(mono_gather(plan, src, 0.0, vals=vals,
                                 mul=lambda a, b: a * b)).reshape(-1)[:2000]
    want = np.asarray(vals)[:2000] * np.asarray(src)[idx]
    assert np.allclose(out, want)


def test_fold8():
    rng = np.random.RandomState(5)
    src_n = 4000
    n = 64 * 128  # S = 64 rows -> 8 fold groups
    idx = np.sort(rng.randint(0, src_n, n))
    plan = MonoPlan.build(idx, src_n)
    src = jnp.asarray(rng.rand(src_n).astype(np.float32))
    out = np.asarray(mono_gather(plan, src, 0.0, fold=lambda a, b: a + b))
    want = np.asarray(src)[idx].reshape(plan.S // 8, 8, 128).sum(axis=1)
    assert np.allclose(out, want, rtol=1e-5)


def test_fold_min_identity():
    rng = np.random.RandomState(6)
    src_n = 1000
    n = 16 * 128
    idx = np.sort(rng.randint(0, src_n, n))
    idx[-100:] = -1  # invalid tail folds to +inf identity
    idx = np.sort(idx)[::-1] * -1  # keep non-decreasing among valid
    idx = np.where(idx > 0, -1, -idx)
    idx.sort()
    idx = np.concatenate([idx[idx >= 0], np.full((idx < 0).sum(), -1)])
    plan = MonoPlan.build(idx, src_n)
    src = jnp.asarray(rng.rand(src_n).astype(np.float32))
    out = np.asarray(mono_gather(plan, src, np.inf, fold=jnp.minimum))
    idxp = np.concatenate([idx, np.full(plan.S * 128 - len(idx), -1)])
    g = np.where(idxp >= 0, np.asarray(src)[np.clip(idxp, 0, None)],
                 np.inf).reshape(plan.S // 8, 8, 128)
    assert np.allclose(out, g.min(axis=1), rtol=1e-6)


def _span_case(monkeypatch):
    """Build the same gather twice — the default group-span encoding and
    the forced per-row encoding — and return both plans plus inputs."""
    from pygraphblas_tpu.core import mono

    rng = np.random.RandomState(7)
    src_n = 9000
    n = 64 * 128
    idx = np.sort(rng.randint(0, src_n, n))
    idx[::11] = -1
    idx = np.concatenate([np.sort(idx[idx >= 0]),
                          np.full((idx < 0).sum(), -1)])
    plans = MonoPlan.build(idx, src_n)
    monkeypatch.setattr(mono, "_SPAN_MAX_WVA", 0)
    plan0 = MonoPlan.build(idx, src_n)
    assert plans.wva > 0 and plan0.wva == 0
    src = jnp.asarray(rng.rand(src_n).astype(np.float32))
    vals = jnp.asarray(rng.rand(plan0.S * 128).astype(np.float32))
    return plan0, plans, src, vals


def test_span_xla_fallback_matches_perrow(monkeypatch):
    plan0, plans, src, vals = _span_case(monkeypatch)
    for kw in ({}, {"vals": vals, "mul": lambda a, b: a * b},
               {"fold": lambda a, b: a + b}):
        want = np.asarray(mono_gather(plan0, src, 0.0, **kw))
        got = np.asarray(mono_gather(plans, src, 0.0, **kw))
        assert np.allclose(got, want, rtol=1e-5)


def test_span_interpret_kernel_matches_perrow(monkeypatch):
    from pygraphblas_tpu.core import mono

    plan0, plans, src, vals = _span_case(monkeypatch)
    want = np.asarray(mono_gather(plan0, src, 0.0, vals=vals,
                                  mul=lambda a, b: a * b))
    monkeypatch.setattr(mono, "_FORCE_INTERPRET", True)
    got = np.asarray(mono_gather(plans, src, 0.0, vals=vals,
                                 mul=lambda a, b: a * b))
    assert np.allclose(got, want, rtol=1e-5)
    # the per-row kernel under interpret mode too
    got0 = np.asarray(mono_gather(plan0, src, 0.0, vals=vals,
                                  mul=lambda a, b: a * b))
    assert np.allclose(got0, want, rtol=1e-5)
    # fold tail in the span kernel
    want_f = np.asarray(mono_gather(plan0, src, 0.0,
                                    fold=lambda a, b: a + b))
    got_f = np.asarray(mono_gather(plans, src, 0.0,
                                   fold=lambda a, b: a + b))
    assert np.allclose(got_f, want_f, rtol=1e-5)


def _cascade_case(max_deg=3000, n=6000, nnz=60000, seed=3):
    """An XSpmvPlan with a multi-level fold cascade (skewed degrees)."""
    from pygraphblas_tpu.core.xspmv import XSpmvPlan

    rng = np.random.RandomState(seed)
    # skewed rows: a few very heavy rows force >= 3 cascade levels
    heavy = rng.randint(0, 50, nnz // 2)
    light = rng.randint(0, n, nnz - nnz // 2)
    rows = np.concatenate([heavy, light])
    cols = rng.randint(0, n, nnz)
    key = rows * n + cols
    key = np.unique(key)
    rows, cols = key // n, key % n
    vals = rng.rand(len(rows)).astype(np.float32)
    plan = XSpmvPlan._build(rows, cols, vals, n, n, np.dtype(np.float32))
    assert len(plan.levels) >= 2
    return plan


def test_mono_cascade_interpret_matches_chain(monkeypatch):
    """The fused cascade kernel (all fold levels + placement in one
    pallas_call) equals the per-level mono_gather chain."""
    from pygraphblas_tpu.core import mono

    plan = _cascade_case()
    rng = np.random.RandomState(7)
    cur0 = jnp.asarray(rng.rand(plan.m1).astype(np.float32))
    fold = lambda a, b: a + b

    cur = cur0
    for lp in plan.levels:
        cur = mono_gather(lp, cur.reshape(-1), 0.0,
                          fold=fold).reshape(-1)
    want = np.asarray(mono_gather(plan.places[0], cur.reshape(-1),
                                  0.0)).reshape(-1)[:plan.nrows]

    monkeypatch.setattr(mono, "_FORCE_INTERPRET", True)
    got2d = mono.mono_cascade(plan.levels, plan.places[0], cur0, 0.0, fold)
    assert got2d is not None
    got = np.asarray(got2d).reshape(-1)[:plan.nrows]
    assert np.allclose(got, want, rtol=1e-5)


def test_mono_cascade_min_fold(monkeypatch):
    """Non-PLUS monoid (MIN with +inf identity) through the cascade."""
    from pygraphblas_tpu.core import mono

    plan = _cascade_case(seed=11)
    rng = np.random.RandomState(13)
    cur0 = jnp.asarray(rng.rand(plan.m1).astype(np.float32))
    fold = jnp.minimum
    inf = np.float32(np.inf)

    cur = cur0
    for lp in plan.levels:
        cur = mono_gather(lp, cur.reshape(-1), inf, fold=fold).reshape(-1)
    want = np.asarray(mono_gather(plan.places[0], cur.reshape(-1),
                                  inf)).reshape(-1)[:plan.nrows]

    monkeypatch.setattr(mono, "_FORCE_INTERPRET", True)
    got2d = mono.mono_cascade(plan.levels, plan.places[0], cur0, inf, fold)
    assert got2d is not None
    got = np.asarray(got2d).reshape(-1)[:plan.nrows]
    assert np.allclose(got, want, rtol=1e-5)
