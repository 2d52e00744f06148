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

    cache = f"/tmp/pygb_bench_kron_s{scale}_ef{edgefactor}.npz"
    if os.path.exists(cache):
        data = np.load(cache)
        rows, cols, n = data["rows"], data["cols"], int(data["n"])
    else:
        rows, cols, n = rmat_edges(scale, edgefactor)
        np.savez(cache, rows=rows, cols=cols, n=n)
    nnz = len(rows)
    A = to_matrix(rows, cols, n, types.FP32)
    print(f"# graph ready: n={n} nnz={nnz}; building/loading SpMV plan "
          "(minutes when /tmp/pygb_plans is cold)...", file=sys.stderr)

    # whole-loop-fused PageRank: the iteration loop is a single XLA
    # executable over the cached csr8 plan (fused.py); tol=0 forces
    # exactly `iters` iterations for a clean nnz/s measurement.  The
    # first run pays one-time compile + device-transfer costs; report
    # the best of three steady-state runs.
    def timed():
        start = time.perf_counter()
        r = fused.pagerank(A, itermax=iters, tol=0.0)
        float(jnp.sum(r._vals))  # hard sync through the host
        return time.perf_counter() - start

    timed()  # compile + transfer warmup
    elapsed = min(timed() for _ in range(3))
    nnz_per_s = nnz * iters / elapsed
    print(json.dumps({
        "metric": f"pagerank_spmv_kron_s{scale}_ef{edgefactor}",
        "value": nnz_per_s,
        "unit": "nnz/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
