"""GAP Betweenness-Centrality benchmark driver (reference:
``gap/bcmark.py``): batched push-pull SpMM frontiers with accumulation.

Usage: python gap/bcmark.py [--scale N] [--rounds R] [--batch B]
"""

import argparse
import random
import time
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=int, default=10)
    p.add_argument("--edgefactor", type=int, default=16)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--eager", action="store_true",
                   help="use the eager per-op path instead of the fused loop")
    args = p.parse_args()

    from pygraphblas_tpu import types, fused
    from pygraphblas_tpu.generators import rmat_edges, to_matrix
    from pygraphblas_tpu.algorithms import betweenness_centrality

    rows, cols, n = rmat_edges(args.scale, args.edgefactor)
    A = to_matrix(rows, cols, n, types.FP32)
    AT = A.T
    random.seed(42)

    times = []
    for r in range(args.rounds):
        sources = [random.randint(0, n - 1) for _ in range(args.batch)]
        start = time.perf_counter()
        if args.eager:
            bc = betweenness_centrality(A, sources, AT)
        else:
            bc = fused.bc(A, sources)
        bc.wait()
        elapsed = time.perf_counter() - start
        times.append(elapsed)
        print(f"round {r}: {elapsed:.4f}s")
    print(f"mean: {sum(times) / len(times):.4f}s")


if __name__ == "__main__":
    main()
