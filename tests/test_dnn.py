"""GraphChallenge DNN inference with the category truth oracle
(reference demo/dnn/challenge.py:67-76), at a size that forces the
huge-matrix tier for the image batch."""

import numpy as np

from pygraphblas_tpu.base import config


def test_dnn_category_oracle_reduced():
    from demo.dnn.challenge import run_fullscale

    run_fullscale(nneurons=64, nlayers=10, nimages=3000)


def test_dnn_category_oracle_forced_sparse():
    """Same recurrence with the image batch forced onto the COO tier
    (unmasked sparse SpGEMM + sparse select/assign)."""
    from demo.dnn.challenge import run_fullscale

    old = config.bitmap_max_cells
    config.bitmap_max_cells = 1
    try:
        run_fullscale(nneurons=32, nlayers=6, nimages=400)
    finally:
        config.bitmap_max_cells = old


def test_fused_dnn_matches_container_path():
    """fused.dnn (one-jit MXU path) vs algorithms.dnn on a synthetic
    RadiX net."""
    import numpy as np
    from pygraphblas_tpu import Matrix, types, fused
    from pygraphblas_tpu.algorithms import dnn as adnn
    from demo.dnn.radix import radix_net
    from demo.dnn.challenge import build_biases

    n, layers = radix_net([4, 4, 4], 6, weight=0.5, seed=3)
    rng = np.random.RandomState(3)
    m = 96
    nnz = m * 6
    r = rng.randint(0, m, nnz).astype(np.int64)
    c = rng.randint(0, n, nnz).astype(np.int64)
    keys = np.unique(r * n + c)
    r, c = keys // n, keys % n
    v = rng.rand(len(r)).astype(np.float32)
    images = Matrix.sparse(types.FP32, m, n)
    images._build(r, c, v)
    biases = build_biases(n, 6, -0.05)

    want = adnn(layers, biases, images)
    got = fused.dnn(layers, biases, images)
    assert got.nrows == want.nrows and got.ncols == want.ncols
    wd = np.zeros((m, n), np.float32)
    wd[np.array(want.rows), np.array(want.cols)] = np.array(want.vals)
    gd = np.zeros((m, n), np.float32)
    gd[np.array(got.rows), np.array(got.cols)] = np.array(got.vals)
    assert np.allclose(wd, gd, rtol=1e-5, atol=1e-5)


def test_hyperdnn_matches_container_path():
    """Whole-net hypersparse block DNN with the fused user-JIT'd ReLU
    semiring (reference demo/dnn/dnn.py:28-50) vs the per-layer
    container path."""
    from pygraphblas_tpu import Matrix, types
    from pygraphblas_tpu.algorithms import hypergraph, hyperdnn, dnn
    from demo.dnn.radix import radix_net
    from demo.dnn.challenge import build_biases

    n, layers = radix_net([4, 4], 6, weight=1.0, seed=3)
    biases = build_biases(n, 6, -0.25)
    rng = np.random.RandomState(0)
    m = 40
    r = rng.randint(0, m, 200)
    c = rng.randint(0, n, 200)
    keys = np.unique(r.astype(np.int64) * n + c)
    r, c = keys // n, keys % n
    v = np.ones(len(r), np.float32)
    Y = Matrix.sparse(types.FP32, m, n)
    Y._build(r.astype(np.int64), c.astype(np.int64), v)
    want = dnn(layers, biases, Y)

    HW = hypergraph(layers)
    HB = hypergraph(biases, diag=True)
    assert HW.nrows == 7 * n
    Yh = Matrix.sparse(types.FP32, m, HW.ncols)
    Yh._build(r.astype(np.int64), c.astype(np.int64), v)
    out = hyperdnn(len(layers), HW, HB, Yh)

    rr, cc, vv = out._coo()
    off = len(layers) * n
    assert (cc >= off).all()
    wd = np.zeros((m, n), np.float32)
    wr, wc, wv = want._coo()
    wd[wr, wc] = wv
    gd = np.zeros((m, n), np.float32)
    gd[rr, cc - off] = vv
    assert np.allclose(wd, gd, atol=1e-5)


def test_hyperdnn_category_oracle_reduced():
    from demo.dnn.challenge import run_fullscale

    run_fullscale(nneurons=64, nlayers=10, nimages=1500,
                  engine="hyperdnn")
