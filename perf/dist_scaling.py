"""Distributed-tier scaling measurement on the virtual CPU mesh.

Measures per-iteration wall time of the distributed PageRank step
(2-D block SpMV + psum + resharding collectives) on meshes of
1/2/4/8 virtual devices over the SAME graph, plus the ring-SpGEMM
distributed triangle count.

On this 1-core build host all virtual devices share one core, so
*speedup* is unmeasurable; what this records is **overhead
conservation**: t(P)/t(1) ~ 1.0 means the partitioned executor + its
collectives add no redundant work or transfer versus the single-device
run — the CPU-mesh proxy for the >=70% scaling-efficiency BASELINE
target (real efficiency needs a real multi-chip slice, which this
environment does not have).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python
     perf/dist_scaling.py [scale]
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def rmat(scale, edgefactor=8, seed=1):
    rng = np.random.RandomState(seed)
    n = 1 << scale
    m = n * edgefactor
    rows = np.zeros(m, np.int64)
    cols = np.zeros(m, np.int64)
    a, b, c = 0.57, 0.19, 0.19
    for lvl in range(scale):
        rb = rng.rand(m)
        cb = rng.rand(m)
        r_bit = rb > (a + b)
        c_bit = np.where(r_bit, cb > (c / (c + (1 - a - b - c))),
                         cb > (a / (a + b)))
        rows |= r_bit.astype(np.int64) << lvl
        cols |= c_bit.astype(np.int64) << lvl
    return n, rows, cols


def main(scale=16):
    from pygraphblas_tpu.parallel.dist import (DistSpMV, make_mesh,
                                               dist_triangle_count)
    from functools import partial
    from pygraphblas_tpu.parallel import dist as dd

    n, rows, cols = rmat(scale)
    nnz = len(rows)
    print(f"graph: n=2^{scale}, nnz={nnz}")
    results = {}
    for P in (1, 2, 4, 8):
        mesh = make_mesh(P)
        N = -(-n // (mesh.shape["i"] * mesh.shape["j"])) * \
            (mesh.shape["i"] * mesh.shape["j"])
        spmv = DistSpMV(mesh, N, N, cols, rows,
                        np.ones(nnz, np.float32), add="PLUS",
                        mul="SECOND")
        deg = np.zeros(N, np.float32)
        np.add.at(deg, rows, 1)
        d_inv = jax.device_put(
            (0.85 / np.maximum(deg, 1)).astype(np.float32), spmv.y_spec)
        r = jax.device_put(np.full(N, 1.0 / n, np.float32), spmv.y_spec)
        tele = np.float32(0.15 / n)
        step = jax.jit(partial(dd.dist_pagerank_step, spmv))
        r1, _ = step(r, d_inv, tele)          # compile + warm
        jax.block_until_ready(r1)
        iters = 10
        t0 = time.time()
        rr = r
        for _ in range(iters):
            rr, rd = step(rr, d_inv, tele)
        jax.block_until_ready(rr)
        dt = (time.time() - t0) / iters
        results[P] = dt
        print(f"P={P}: {dt*1e3:8.2f} ms/iter   "
              f"t1/tP={results[1]/dt:5.2f}  "
              f"({nnz/dt/1e6:.1f} Mnnz/s aggregate)")
    t1 = results[1]
    print("overhead conservation t(P)/t(1):",
          {p: round(results[p] / t1, 2) for p in results})

    # distributed TC wall (P=8)
    mesh = make_mesh(8)
    t0 = time.time()
    tc = dist_triangle_count(mesh, n, np.concatenate([rows, cols]),
                             np.concatenate([cols, rows]))
    print(f"dist TC (P=8): {tc} triangles in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
