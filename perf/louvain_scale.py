"""Engine-native Louvain at 500k nodes on a planted 1000-block model.

Reproduces the PERF.md "Round-3: engine-native Louvain at 500k nodes"
record: builds a 500,000-node / ~21M-edge symmetric graph with 1000
planted communities, runs `algorithms.louvain_cluster` (local moves =
semiring SpGEMM onto the membership matrix; contraction = P^T (W P)
mxm — see reference demo/Louvain.ipynb for the algorithm contract), and
reports wall clock plus planted-block purity.

Run: python perf/louvain_scale.py [nblocks bsize]   (default 1000 500)
"""
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from pygraphblas_tpu import Matrix, types  # noqa: E402
from pygraphblas_tpu.algorithms import louvain_cluster  # noqa: E402


def planted_block_graph(nblocks, bsize, intra_deg=20, inter_deg=2, seed=42):
    rng = np.random.RandomState(seed)
    n = nblocks * bsize
    intra_src = rng.randint(0, n, n * intra_deg // 2)
    intra_dst = (intra_src // bsize) * bsize + rng.randint(
        0, bsize, intra_src.shape[0])
    inter_src = rng.randint(0, n, n * inter_deg // 2)
    inter_dst = rng.randint(0, n, n * inter_deg // 2)
    src = np.concatenate([intra_src, inter_src, intra_dst, inter_dst])
    dst = np.concatenate([intra_dst, inter_dst, intra_src, inter_src])
    keep = src != dst
    return src[keep], dst[keep], n


def main():
    nblocks = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    bsize = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    src, dst, n = planted_block_graph(nblocks, bsize)
    A = Matrix.sparse(types.FP64, n, n)
    A._build(src.astype(np.int64), dst.astype(np.int64),
             np.ones(len(src)))
    print(f"n={n} nnz={A.nvals}", flush=True)

    t0 = time.time()
    labels = louvain_cluster(A)
    wall = time.time() - t0

    lab = np.asarray(labels.npV)
    blocks = np.arange(n) // bsize
    # purity: fraction of nodes whose block's majority label they carry
    from collections import Counter
    agree = sum(Counter(lab[blocks == b]).most_common(1)[0][1]
                for b in range(nblocks))
    ncomm = len(np.unique(lab))
    print(f"louvain {n//1000}k: {wall:.1f}s, {ncomm} communities, "
          f"planted-block purity {agree / n:.3f}", flush=True)


if __name__ == "__main__":
    main()
