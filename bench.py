"""Benchmark driver: masked semiring SpMV (PageRank) nnz/s on a
GAP-style kron (RMAT) graph, run through the library's sparse execution
path on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "nnz/s", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); vs_baseline is
reported against a nominal 1.0.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    scale = int(os.environ.get("BENCH_SCALE", "20"))
    edgefactor = int(os.environ.get("BENCH_EDGEFACTOR", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "50"))

    import jax
    import jax.numpy as jnp

    from pygraphblas_tpu import types, fused
    from pygraphblas_tpu.generators import rmat_edges, to_matrix

    rows, cols, n = rmat_edges(scale, edgefactor)
    nnz = len(rows)
    A = to_matrix(rows, cols, n, types.FP32)

    # whole-loop-fused PageRank: the iteration loop is a single XLA
    # executable over the degree-binned ELL arrays (fused.py); tol=0
    # forces exactly `iters` iterations for a clean nnz/s measurement
    r = fused.pagerank(A, itermax=2, tol=0.0)  # warmup/compile(2-iter)
    r.wait()
    r = fused.pagerank(A, itermax=iters, tol=0.0)  # compile(full)
    r.wait()

    start = time.perf_counter()
    r = fused.pagerank(A, itermax=iters, tol=0.0)
    float(jnp.sum(r._vals))  # hard sync through the host
    elapsed = time.perf_counter() - start

    nnz_per_s = nnz * iters / elapsed
    print(json.dumps({
        "metric": f"pagerank_spmv_kron_s{scale}_ef{edgefactor}",
        "value": nnz_per_s,
        "unit": "nnz/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
