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
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    import jax

    from pygraphblas_tpu import types, descriptor
    from pygraphblas_tpu.generators import rmat_edges, to_matrix
    from pygraphblas_tpu.matrix import Matrix
    from pygraphblas_tpu.vector import Vector

    rows, cols, n = rmat_edges(scale, edgefactor)
    nnz = len(rows)
    A = to_matrix(rows, cols, n, types.FP32)

    # degree-normalized transposed plus_second SpMV (the PageRank kernel,
    # gap/prmark.py formulation)
    d = A.reduce_vector(types.FP32.PLUS_MONOID)
    damping = np.float32(0.85)
    d = d.apply_second(types.FP32.DIV, damping)
    r = Vector.dense(types.FP32, n, fill=np.float32(1.0 / n))
    t = Vector.dense(types.FP32, n, fill=np.float32(0.0))
    teleport = np.float32((1 - damping) / n)

    def step(r, t):
        w = r.emult(d, types.FP32.DIV)
        t.assign_scalar(teleport)
        A.mxv(w, out=t, accum=types.FP32.PLUS,
              semiring=types.FP32.plus_second, desc=descriptor.T0)
        return t, r

    # warmup (compile)
    r, t = step(r, t)
    r.wait()

    start = time.perf_counter()
    for _ in range(iters):
        r, t = step(r, t)
    r.wait()
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
