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
def run(nneurons, images, layers, biases):
    from pygraphblas_tpu.algorithms import dnn

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


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--ndir", default=None,
                   help="GraphChallenge dataset directory")
    p.add_argument("--nneurons", type=int, default=1024)
    p.add_argument("--nlayers", type=int, default=120)
    args = p.parse_args()
    if args.ndir:
        run_challenge(args.ndir, args.nneurons, args.nlayers)
    else:
        run_synthetic()
