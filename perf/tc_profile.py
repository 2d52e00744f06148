"""Phase profile of triangle_count on the real TPU (kron-16 sym).

Wraps the masked-SpGEMM internals with timers/counters to show where
the warm seconds go: host prep, heavy-edge host path, pair_fast chunk
dispatches, generic buckets, result pull.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pygb_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pygraphblas_tpu import types
from pygraphblas_tpu.generators import rmat_edges, to_matrix
from pygraphblas_tpu.core import spgemm as sg


def sym_kron(scale):
    cache = f"/tmp/pygb_bench_kron_s{scale}_ef16_sym.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        return d["rows"], d["cols"], int(d["n"])
    rows, cols, n = rmat_edges(scale, 16)
    rows, cols = (np.concatenate([rows, cols]),
                  np.concatenate([cols, rows]))
    keep = rows != cols
    rows, cols = rows[keep], cols[keep]
    keys = rows.astype(np.int64) * n + cols
    _, idx = np.unique(keys, return_index=True)
    rows, cols = rows[idx], cols[idx]
    np.savez(cache, rows=rows, cols=cols, n=n)
    return rows, cols, n


STATS = {}


def wrap(name, fn):
    def inner(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        dt = time.perf_counter() - t0
        s = STATS.setdefault(name, [0, 0.0])
        s[0] += 1
        s[1] += dt
        return r
    return inner


def main():
    scale = int(os.environ.get("TC_SCALE", "16"))
    rows, cols, n = sym_kron(scale)
    print(f"kron-{scale}: n={n} nnz={len(rows)}", flush=True)
    A = to_matrix(rows, cols, n, types.INT64)

    sg._bucket_build_intersect = wrap("bucket_generic",
                                      sg._bucket_build_intersect)
    orig_spgemm = sg.masked_spgemm

    def profiled(*a, **k):
        t0 = time.perf_counter()
        r = orig_spgemm(*a, **k)
        STATS.setdefault("masked_spgemm", [0, 0.0])
        STATS["masked_spgemm"][0] += 1
        STATS["masked_spgemm"][1] += time.perf_counter() - t0
        return r

    sg.masked_spgemm = profiled
    import pygraphblas_tpu.core.gustavson as gk
    if getattr(gk, "masked_spgemm", None) is orig_spgemm:
        gk.masked_spgemm = profiled

    from pygraphblas_tpu.algorithms import triangle_count

    for run in ("cold", "warm", "warm2"):
        STATS.clear()
        t0 = time.perf_counter()
        ntri = triangle_count(A, "sandia")
        dt = time.perf_counter() - t0
        print(f"{run}: {dt:.3f}s triangles={ntri}", flush=True)
        for k, (cnt, tot) in sorted(STATS.items()):
            print(f"  {k:>16}: {cnt:4d} calls {tot:8.3f}s", flush=True)


if __name__ == "__main__":
    main()
