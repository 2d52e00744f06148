"""Segmented fold-scan primitive (core/scan.py)."""

import numpy as np
import jax.numpy as jnp

from pygraphblas_tpu.core.scan import segfold_scan


def _ref(v, f, op, ident):
    out = np.empty_like(v)
    acc = ident
    for i in range(len(v)):
        acc = v[i] if f[i] else op(acc, v[i])
        out[i] = acc
    return out


def test_segfold_plus():
    rng = np.random.RandomState(1)
    m = 4096
    v = rng.rand(m).astype(np.float32)
    f = rng.rand(m) < 0.05
    f[0] = True
    got = np.asarray(segfold_scan(jnp.asarray(v), jnp.asarray(f),
                                  lambda a, b: a + b, 0.0))
    assert np.allclose(got, _ref(v, f, np.add, 0.0), rtol=1e-4)


def test_segfold_min():
    rng = np.random.RandomState(2)
    m = 2048
    v = rng.rand(m).astype(np.float32)
    f = rng.rand(m) < 0.1
    f[0] = True
    got = np.asarray(segfold_scan(jnp.asarray(v), jnp.asarray(f),
                                  jnp.minimum, np.inf))
    assert np.allclose(got, _ref(v, f, np.minimum, np.inf))
