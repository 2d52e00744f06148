"""GAP PageRank benchmark driver (reference: ``gap/prmark.py``).

Usage: python gap/prmark.py [--scale N] [--rounds R] [--graph kron|urand]
Loads/generates the graph, runs PageRank for the configured rounds, and
prints per-round wall time, mean, and nnz/s.
"""

import argparse
import time
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=int, default=18)
    p.add_argument("--edgefactor", type=int, default=16)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--graph", default="kron", choices=["kron", "urand"])
    p.add_argument("--binfile", default=None,
                   help="load a .npz binary checkpoint instead of generating")
    p.add_argument("--eager", action="store_true",
                   help="use the eager per-op path instead of the fused loop")
    p.add_argument("--engine", default=None, choices=["auto", "csr8", "xspmv"],
                   help="SpMV engine (csr8 skips the minutes-long xspmv "
                        "plan build; right choice for one-shot runs)")
    p.add_argument("--async-plan", action="store_true",
                   help="never block on the xspmv plan build: rounds run "
                        "the planless COO tier immediately and upgrade "
                        "once the background build lands (first-touch "
                        "tiering for fresh GAP-scale graphs)")
    args = p.parse_args()

    if args.engine or args.async_plan:
        from pygraphblas_tpu.base import options_set
        if args.engine:
            options_set(spmv_engine=args.engine)
        if args.async_plan:
            options_set(spmv_plan_async=True)

    from pygraphblas_tpu import types, fused
    from pygraphblas_tpu.matrix import Matrix
    from pygraphblas_tpu.generators import rmat_edges, urand_edges, to_matrix
    from pygraphblas_tpu.algorithms import pagerank

    if args.binfile:
        A = Matrix.binread(args.binfile)
        nnz = A.nvals
    else:
        gen = rmat_edges if args.graph == "kron" else urand_edges
        rows, cols, n = gen(args.scale, args.edgefactor)
        A = to_matrix(rows, cols, n, types.FP32)
        nnz = len(rows)

    d = A.reduce_vector(types.FP32.PLUS_MONOID)

    times = []
    for r in range(args.rounds):
        start = time.perf_counter()
        if args.eager:
            result = pagerank(A, damping=0.85, itermax=100, tol=1e-4,
                              d=d.dup())
        else:  # whole-loop-fused production path
            result = fused.pagerank(A, damping=0.85, itermax=100, tol=1e-4)
        result.wait()
        # hard sync: block_until_ready does not reliably block through
        # the remote-TPU tunnel; a host value pull does
        import jax.numpy as jnp
        float(jnp.sum(result._dense_pair()[0]))
        elapsed = time.perf_counter() - start
        times.append(elapsed)
        print(f"round {r}: {elapsed:.4f}s")
    mean = sum(times) / len(times)
    print(f"mean: {mean:.4f}s  nnz/s per full run: {nnz / mean:.3e}")


if __name__ == "__main__":
    main()
