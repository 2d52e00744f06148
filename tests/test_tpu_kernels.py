"""Device-kernel conformance tests — run ONLY on a real TPU backend
(the CI conftest forces CPU, where these skip; run manually with
`python -m pytest tests/test_tpu_kernels.py --no-header -p no:cacheprovider`
outside the conftest, or via perf/ harnesses).

These mirror the in-session round-5 verifications: the fused pair
kernel vs the unfused chain, and the valued fused kernel vs the
generic bucket path, on the actual Mosaic lowerings.
"""

import numpy as np
import pytest

import jax

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="device-kernel test; CI runs the CPU backend")


@requires_tpu
def test_fused_pair_kernel_matches_unfused():
    import jax.numpy as jnp

    from pygraphblas_tpu.core import spgemm as sg

    rng = np.random.RandomState(1)
    NNZ = 1 << 16
    pad = lambda x: np.concatenate([x, np.zeros(1280, np.int32)])
    a2 = jnp.asarray(pad(np.sort(rng.randint(
        0, 20000, NNZ).astype(np.int32))).reshape(-1, 128))
    for W in (128, 1024, 8192):
        E = 512
        ast = rng.randint(0, NNZ - W - 256, E).astype(np.int32)
        wa = rng.randint(0, min(W // 2, 200), E).astype(np.int32)
        bst = rng.randint(0, NNZ - W - 256, E).astype(np.int32)
        wb = np.minimum(rng.randint(0, min(W - 1, 300), E)
                        .astype(np.int32), W - wa)
        args = [jnp.asarray(x) for x in (ast, wa, bst, wb)]
        cnt_f = np.asarray(sg._pallas_fill_merge_count(a2, a2, *args, W))
        keys = sg._pallas_fill_keys(a2, a2, *args, W)
        ks = sg._bitonic_merge(keys) if W <= 4096 \
            else jax.lax.sort(keys, dimension=1)
        match = (ks[:, :-1] >> 1) == (ks[:, 1:] >> 1)
        cnt_u = np.asarray(jnp.sum(match.astype(jnp.int32), axis=1))
        assert np.array_equal(cnt_f, cnt_u), W


@requires_tpu
@pytest.mark.parametrize("semname,dtype", [
    ("plus_times", np.int64), ("min_plus", np.int64),
    ("plus_times", np.float32)])
def test_valued_fused_matches_generic(semname, dtype, monkeypatch):
    from pygraphblas_tpu import types
    from pygraphblas_tpu.core import spgemm as sg

    typ = types.INT64 if dtype == np.int64 else types.FP32
    sem = getattr(typ, semname)
    rng = np.random.RandomState(2)
    n, nnz = 1500, 30000
    r = rng.randint(0, n, nnz)
    c = rng.randint(0, n, nnz)
    keys = np.unique(r.astype(np.int64) * n + c)
    r, c = keys // n, keys % n
    va = rng.randint(1, 6, len(r)).astype(dtype)
    order = np.lexsort((r, c))
    btr, btc, btv = c[order], r[order], va[order]
    monkeypatch.setenv("PYGB_VAL_FUSED", "1")
    r1, c1, v1 = sg.masked_spgemm(r, c, va, btr, btc, btv, r, c,
                                  sem, dtype)
    monkeypatch.setenv("PYGB_VAL_FUSED", "0")
    r0, c0, v0 = sg.masked_spgemm(r, c, va, btr, btc, btv, r, c,
                                  sem, dtype)
    assert np.array_equal(r1, r0) and np.array_equal(c1, c0)
    assert np.allclose(v1.astype(np.float64), v0.astype(np.float64),
                       rtol=1e-5)
