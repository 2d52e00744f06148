"""GraphChallenge Sparse DNN harness (reference ``demo/dnn/challenge.py``).

Loads the GraphChallenge dataset layout when present on disk (neuron
weights TSVs + MNIST feature TSV + truth categories); otherwise falls
back to a RadiX-Net synthetic network so the benchmark runs hermetically.
The category oracle asserts predicted categories match the truth file —
the end-to-end numeric correctness check (reference challenge.py:74-76).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import numpy as np

from demo.dnn import timing
from demo.dnn.radix import radix_net

NFEATURES = 60000
BIAS = {1024: -0.3, 4096: -0.35, 16384: -0.4, 65536: -0.45}


@timing
def load_layers(ndir, nneurons, nlayers):
    from pygraphblas_tpu import Matrix, types

    layers = []
    for i in range(nlayers):
        fname = Path(ndir) / f"neuron{nneurons}" / \
            f"n{nneurons}-l{i + 1}.tsv"
        layers.append(Matrix.from_tsv(str(fname), types.FP32,
                                      nneurons, nneurons))
    return layers


@timing
def load_images(ndir, nneurons):
    from pygraphblas_tpu import Matrix, types

    fname = Path(ndir) / f"sparse-images-{nneurons}.tsv"
    return Matrix.from_tsv(str(fname), types.FP32, NFEATURES, nneurons)


@timing
def load_categories(ndir, nneurons, nlayers):
    fname = Path(ndir) / "DNN" / \
        f"neuron{nneurons}-l{nlayers}-categories.tsv"
    return {int(line) - 1 for line in open(fname)}


def build_biases(nneurons, nlayers, bias):
    from pygraphblas_tpu import Matrix, types

    return [Matrix.identity(types.FP32, nneurons, value=bias)
            for _ in range(nlayers)]


@timing
def run(nneurons, images, layers, biases, fused=True):
    """The fused MXU path (pygraphblas_tpu.fused.dnn — one jit for the
    whole net) when the dense working set fits, else the per-op
    container path (algorithms.dnn)."""
    from pygraphblas_tpu import fused as fk
    from pygraphblas_tpu.algorithms import dnn

    m, n = images.nrows, nneurons
    cells = max(m * n, n * n * len(layers))
    if fused and not images._is_huge and cells * 4 <= (4 << 30):
        result = fk.dnn(layers, biases, images)
    else:
        result = dnn(layers, biases, images)
    result.wait()
    return result


def run_challenge(ndir, nneurons, nlayers):
    """Run the official dataset with the category truth oracle."""
    layers = load_layers(ndir, nneurons, nlayers)
    images = load_images(ndir, nneurons)
    biases = build_biases(nneurons, nlayers, BIAS[nneurons])
    result = run(nneurons, images, layers, biases)
    predicted = set(result.reduce_vector().nonzero().indices)
    truth = load_categories(ndir, nneurons, nlayers)
    assert predicted == truth, "category mismatch vs truth file"
    print(f"OK: {len(predicted)} categories match")
    return result


def run_synthetic(radices=(4, 4, 4), nlayers=12, nimages=512, seed=7):
    """Hermetic RadiX-Net run with a self-consistency oracle."""
    from pygraphblas_tpu import Matrix, types

    n, layers = radix_net(list(radices), nlayers, weight=None, seed=seed)
    rng = np.random.RandomState(seed)
    nnz = nimages * 8
    img_r = rng.randint(0, nimages, nnz)
    img_c = rng.randint(0, n, nnz)
    img_v = rng.rand(nnz).astype(np.float32)
    images = Matrix.sparse(types.FP32, nimages, n)
    images._build(img_r, img_c, img_v)
    biases = build_biases(n, nlayers, -0.1)
    result = run(n, images, layers, biases)
    print(f"synthetic dnn: {result.nvals} outputs, "
          f"max={result.reduce_float(types.FP32.MAX_MONOID):.4f}")
    return result


def _scipy_dnn_oracle(img_r, img_c, img_v, layer_triples, nfeat, n, bias):
    """Reference implementation of the GraphChallenge recurrence
    (Y = clip32(relu(Y@W + bias on pattern))) in scipy, for the category
    truth oracle when the official dataset is not on disk."""
    from scipy import sparse as sp

    Y = sp.coo_matrix((img_v, (img_r, img_c)),
                      shape=(nfeat, n)).tocsr()
    for (wr, wc, wv) in layer_triples:
        W = sp.coo_matrix((wv, (wr, wc)), shape=(n, n)).tocsr()
        Y = (Y @ W).tocsr()
        Y.data += np.float32(bias)      # bias on the product pattern
        Y.data = np.minimum(np.maximum(Y.data, 0), 32).astype(np.float32)
        Y.eliminate_zeros()
    return Y


def run_fullscale(nneurons=1024, nlayers=120, nimages=NFEATURES, seed=7,
                  engine="dnn"):
    """The official-size run (60,000 x nneurons images through nlayers
    RadiX-Net layers) with a self-computed category truth oracle —
    the reference's dataset-scale config (demo/dnn/dnn.sh) made hermetic
    (no network egress for the GraphChallenge tarballs).

    ``engine="hyperdnn"`` routes through the whole-net hypersparse
    block matrix with the fused user-JIT'd ReLU semiring
    (algorithms.hyperdnn; reference demo/dnn/dnn.py:28-50).
    """
    from pygraphblas_tpu import Matrix, types

    # exact-radix network at nneurons; like the official nets, layers
    # have uniform degree r and a constant weight tuned so the expected
    # activation (fill * r * weight + bias) stays positive
    radices = []
    n = nneurons
    while n > 1:
        for r in (32, 16, 8, 4, 2):
            if n % r == 0:
                radices.append(r)
                n //= r
                break
    deg = min(radices)
    # weight and bias are exact binary fractions so every activation is
    # exactly representable in fp32 -- the category oracle is then
    # independent of summation order (engine vs scipy)
    n, layers = radix_net(radices, nlayers, weight=4.0 / deg, seed=seed)
    assert n == nneurons, (n, nneurons)

    rng = np.random.RandomState(seed)
    # binary images with per-row fill in [0, 0.3): sparse rows die in
    # the network, dense rows survive, so the category set is a real
    # discrimination oracle (like the official truth files)
    counts = rng.randint(0, max(2, int(0.3 * n)), nimages)
    img_r = np.repeat(np.arange(nimages), counts)
    img_c = rng.randint(0, n, counts.sum())
    keys = img_r.astype(np.int64) * n + img_c
    _, first = np.unique(keys, return_index=True)
    img_r, img_c = img_r[first], img_c[first]
    img_v = np.ones(len(img_r), np.float32)
    images = Matrix.sparse(types.FP32, nimages, n)
    images._build(img_r.astype(np.int64), img_c.astype(np.int64), img_v)

    bias = -0.25
    biases = build_biases(n, nlayers, bias)
    if engine == "hyperdnn":
        from pygraphblas_tpu.algorithms import hypergraph, hyperdnn

        HW = hypergraph(layers)
        HB = hypergraph(biases, diag=True)
        Yh = Matrix.sparse(types.FP32, nimages, HW.ncols)
        Yh._build(img_r.astype(np.int64), img_c.astype(np.int64), img_v)
        result = hyperdnn(nlayers, HW, HB, Yh)
        result.wait()
    else:
        result = run(n, images, layers, biases)
    predicted = set(result.reduce_vector().nonzero().indices)

    truth_Y = _scipy_dnn_oracle(
        img_r, img_c, img_v, [w._coo() for w in layers],
        nimages, n, bias)
    truth = set(np.nonzero(np.asarray(
        truth_Y.sum(axis=1)).ravel() != 0)[0].tolist())
    assert predicted == truth, (
        f"category mismatch: {len(predicted ^ truth)} differ")
    print(f"OK: {len(predicted)} categories match the oracle "
          f"({nimages} images x {nneurons} neurons x {nlayers} layers)")
    return result


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--ndir", default=None,
                   help="GraphChallenge dataset directory")
    p.add_argument("--nneurons", type=int, default=1024)
    p.add_argument("--nlayers", type=int, default=120)
    p.add_argument("--fullscale", action="store_true",
                   help="official-size hermetic run with oracle")
    p.add_argument("--nimages", type=int, default=NFEATURES)
    p.add_argument("--engine", default="dnn", choices=("dnn", "hyperdnn"),
                   help="per-layer container path, or the whole-net "
                        "hypersparse block matrix with the fused "
                        "user-JIT ReLU semiring (verified at "
                        "1024x120x4000: categories match the oracle)")
    args = p.parse_args()
    if args.ndir:
        run_challenge(args.ndir, args.nneurons, args.nlayers)
    elif args.fullscale:
        run_fullscale(args.nneurons, args.nlayers, args.nimages,
                      engine=args.engine)
    else:
        run_synthetic()
