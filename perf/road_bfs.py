"""Road-class BFS: host direction-optimized loop vs the device-resident
fused frontier loop (fused.bfs_frontier) at scale-22 (4.2M vertices).

The graph is a 2048x2048 grid with wrap-free 4-neighborhood plus a 5%
random chord sprinkle — high diameter (~thousands of levels), low
degree: the GAP "road" workload shape (SURVEY §6).

Run: python perf/road_bfs.py [--side 2048] [--host-only|--device-only]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def road_graph(side, seed=0):
    n = side * side
    idx = np.arange(n, dtype=np.int64)
    right = idx[(idx % side) != side - 1]
    down = idx[idx < n - side]
    src = np.concatenate([right, down])
    dst = np.concatenate([right + 1, down + side])
    rng = np.random.RandomState(seed)
    nch = n // 20
    cs = rng.randint(0, n, nch)
    cd = np.minimum(cs + rng.randint(1, 2 * side, nch), n - 1)
    src = np.concatenate([src, cs])
    dst = np.concatenate([dst, cd])
    rows = np.concatenate([src, dst])
    cols = np.concatenate([dst, src])
    return rows, cols, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=2048)
    ap.add_argument("--host-only", action="store_true")
    ap.add_argument("--device-only", action="store_true")
    args = ap.parse_args()

    from pygraphblas_tpu import Matrix, types, fused
    from pygraphblas_tpu import algorithms

    rows, cols, n = road_graph(args.side)
    print(f"road-like graph: n={n} nnz={len(rows)}", flush=True)
    A = Matrix.sparse(types.BOOL, n, n)
    A._build(rows, cols, np.ones(len(rows), np.bool_))
    A.wait()

    res = {}
    if not args.device_only:
        t0 = time.perf_counter()
        lv_h = algorithms.bfs_level(A, 0)
        res["host_s"] = time.perf_counter() - t0
        print(f"host bfs_level: {res['host_s']:.2f}s "
              f"(reached {lv_h.nvals})", flush=True)
    if not args.host_only:
        t0 = time.perf_counter()
        lv_d = fused.bfs_frontier(A, 0)
        res["device_first_s"] = time.perf_counter() - t0
        print(f"device bfs_frontier first: {res['device_first_s']:.2f}s "
              f"(reached {lv_d.nvals})", flush=True)
        t0 = time.perf_counter()
        lv_d = fused.bfs_frontier(A, 1)
        res["device_warm_s"] = time.perf_counter() - t0
        print(f"device bfs_frontier warm:  {res['device_warm_s']:.2f}s",
              flush=True)
    if not args.device_only and not args.host_only:
        hn, dn = lv_h.nvals, lv_d.nvals
        assert hn == dn, (hn, dn)
        print("host/device reach agree", flush=True)
    print(res, flush=True)


if __name__ == "__main__":
    main()
