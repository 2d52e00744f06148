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

    print("# warmup (plan build/load + compile + transfer)...",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    timed()  # compile + transfer warmup
    print(f"# warmup done in {time.perf_counter() - t0:.1f}s; timing...",
          file=sys.stderr, flush=True)
    elapsed = min(timed() for _ in range(3))
    print(f"# pagerank timed: {elapsed:.3f}s", file=sys.stderr, flush=True)
    nnz_per_s = nnz * iters / elapsed

    extras = {}
    if os.environ.get("BENCH_EXTRAS", "1") == "1":
        extras = bench_extras()

    print(json.dumps({
        "metric": f"pagerank_spmv_kron_s{scale}_ef{edgefactor}",
        "value": nnz_per_s,
        "unit": "nnz/s",
        "vs_baseline": 1.0,
        "extras": extras,
    }))


def bench_extras():
    """Secondary BASELINE configs: fused BFS (config[1]), triangle
    counting at kron-16 (config[2]), batched BC (config[3])."""
    import jax.numpy as jnp
    import time as _t

    from pygraphblas_tpu import types, fused
    from pygraphblas_tpu.algorithms import triangle_count, bfs_level
    from pygraphblas_tpu.generators import rmat_edges, to_matrix

    out = {}
    import sys as _sys

    def _note(msg):
        print("# " + msg, file=_sys.stderr, flush=True)

    # --- fused BFS at kron-18 (low diameter, dense-frontier loop) ----
    scale = int(os.environ.get("BENCH_BFS_SCALE", "18"))
    cache = f"/tmp/pygb_bench_kron_s{scale}_ef16.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        rows, cols, n = d["rows"], d["cols"], int(d["n"])
    else:
        rows, cols, n = rmat_edges(scale, 16)
        np.savez(cache, rows=rows, cols=cols, n=n)
    A = to_matrix(rows, cols, n, types.BOOL)
    _note(f"bfs graph ready (scale {scale}); fused bfs compile+run...")
    t0 = time.perf_counter()
    lv = fused.bfs_level(A, 0)
    float(jnp.sum(lv._vals))
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    lv = fused.bfs_level(A, 1)
    float(jnp.sum(lv._vals))
    t_warm = time.perf_counter() - t0
    out[f"bfs_fused_kron_s{scale}"] = {
        "edges_per_s": len(rows) / t_warm, "first_s": t_first}
    t0 = time.perf_counter()
    bfs_level(A, 2)
    out[f"bfs_push_kron_s{scale}"] = {
        "edges_per_s": len(rows) / (time.perf_counter() - t0)}

    # --- triangle counting at kron-16 (masked SpGEMM, config[2]) -----
    scale = int(os.environ.get("BENCH_TC_SCALE", "16"))
    cache = f"/tmp/pygb_bench_kron_s{scale}_ef16_sym.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        rows, cols, n = d["rows"], d["cols"], int(d["n"])
    else:
        rows, cols, n = rmat_edges(scale, 16)
        rows, cols = (np.concatenate([rows, cols]),
                      np.concatenate([cols, rows]))
        keep = rows != cols
        rows, cols = rows[keep], cols[keep]
        keys = rows.astype(np.int64) * n + cols
        _, idx = np.unique(keys, return_index=True)
        rows, cols = rows[idx], cols[idx]
        np.savez(cache, rows=rows, cols=cols, n=n)
    A = to_matrix(rows, cols, n, types.INT64)
    _note(f"tc graph ready (scale {scale}); triangle_count...")
    t0 = time.perf_counter()
    ntri = triangle_count(A, "sandia")
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    ntri = triangle_count(A, "sandia")   # warm: executables cached
    t_tc = time.perf_counter() - t0
    out[f"tc_kron_s{scale}"] = {
        "edges_per_s": len(rows) / t_tc, "triangles": int(ntri),
        "seconds": t_tc, "first_s": t_first}

    # --- batched betweenness centrality (config[3]) ------------------
    from pygraphblas_tpu import fused as _f

    _note("bc4...")
    Af = A.cast(types.FP32)
    t0 = time.perf_counter()
    bcv = _f.bc(Af, [0, 1, 2, 3])
    float(jnp.sum(bcv._vals))
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    bcv = _f.bc(Af, [4, 5, 6, 7])
    float(jnp.sum(bcv._vals))
    t_bc = time.perf_counter() - t0
    out[f"bc4_kron_s{scale}"] = {"seconds": t_bc, "first_s": t_first}
    return out


def supervised():
    """Run main() in a child process with a deadline and one retry.

    The remote-TPU tunnel occasionally wedges a single client connection
    (blocked forever before the first transfer); a fresh process always
    reconnects cleanly, so a supervisor + retry makes the benchmark
    robust against it."""
    import subprocess

    deadline = int(os.environ.get("BENCH_DEADLINE", "2400"))
    for attempt in range(2):
        env = dict(os.environ, BENCH_INNER="1")
        try:
            res = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                env=env, timeout=deadline, capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print(f"# attempt {attempt}: deadline {deadline}s exceeded "
                  "(tunnel wedge?); retrying in a fresh process",
                  file=sys.stderr, flush=True)
            continue
        sys.stderr.write(res.stderr)
        out = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
        if res.returncode == 0 and out:
            print(out[-1])
            return
        print(f"# attempt {attempt}: exit {res.returncode}",
              file=sys.stderr, flush=True)
    raise SystemExit("bench failed after retries")


if __name__ == "__main__":
    if os.environ.get("BENCH_INNER"):
        main()
    else:
        supervised()
