"""xspmv phase microbenchmark on the live backend.

Times each pipeline phase in isolation (loops compiled into one jit, so
per-dispatch tunnel latency cancels; PERF.md methodology).

Run: python perf/xbench.py [--scale 20] [--iters 30]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timed_loop(fn, plan, x0, iters, name):
    """fn(plan, x) -> array; plan passed as a jit ARGUMENT so its arrays
    travel as device buffers, not HLO constants (the remote-compile
    transport rejects multi-hundred-MB payloads)."""
    import jax
    import jax.numpy as jnp

    def loop(pl, x):
        def body(i, acc):
            return fn(pl, acc)
        return jax.lax.fori_loop(0, iters, body, x)

    jl = jax.jit(loop)
    r = jl(plan, x0)
    float(jnp.sum(r.astype(np.float32)))  # warm + sync
    t0 = time.perf_counter()
    r = jl(plan, x0)
    float(jnp.sum(r.astype(np.float32)))
    el = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {el * 1e3:8.3f} ms/iter", flush=True)
    return el


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=int, default=20)
    p.add_argument("--iters", type=int, default=200)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import os
    from pygraphblas_tpu import types
    from pygraphblas_tpu.generators import rmat_edges
    from pygraphblas_tpu.core.xspmv import XSpmvPlan, xspmv, _ADDS, _MULS
    from pygraphblas_tpu.core.mono import mono_gather
    from pygraphblas_tpu import semiring as sr

    cache = f"/tmp/pygb_bench_kron_s{args.scale}_ef16.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        rows, cols, n = d["rows"], d["cols"], int(d["n"])
    else:
        rows, cols, n = rmat_edges(args.scale, 16)
        np.savez(cache, rows=rows, cols=cols, n=n)
    nnz = len(rows)
    print(f"n={n} nnz={nnz}", flush=True)
    vals = np.ones(nnz, np.float32)
    t0 = time.perf_counter()
    plan = XSpmvPlan.build(cols, rows, vals, n, n, np.dtype(np.float32))
    print(f"plan build/load: {time.perf_counter() - t0:.1f}s", flush=True)

    semiring = sr.PLUS_SECOND_FP32
    x0 = jnp.asarray(np.random.RandomState(0).rand(n).astype(np.float32))

    # full pipeline
    def full(pl, x):
        y, _ = xspmv(pl, x, semiring, np.float32)
        return y
    el = timed_loop(full, plan, x0, args.iters, "full xspmv")
    print(f"{'':28s} -> {nnz / el / 1e9:.3f} Gnnz/s", flush=True)

    fold = _ADDS["PLUS"][0]
    mul = _MULS["SECOND"]

    # decode phase (monotone windowed gather + mul)
    def decode(pl, x):
        return mono_gather(pl.decode, x, np.float32(0),
                           vals=pl.vals_col, mul=mul).reshape(-1)[:n]
    timed_loop(decode, plan, x0, args.iters, "decode+mul")

    # Benes permutation
    flat0 = jnp.asarray(np.random.RandomState(1).rand(plan.n_perm)
                        .astype(np.float32))

    def permute(pl, f):
        return pl.perm.apply(f)
    timed_loop(permute, plan, flat0, args.iters, "benes permutation")

    # level-0 8-ary fold + cascade
    m1 = plan.m1
    f0 = jnp.asarray(np.random.RandomState(2).rand(8 * m1)
                     .astype(np.float32))

    def folds(pl, f):
        # matches the shipped xspmv layout: (m1//128, 8, 128) tiles,
        # sublane-dim 8-ary fold
        fk = f.reshape(m1 // 128, 8, 128)
        acc = fk[:, 0, :]
        for s in range(1, 8):
            acc = fold(acc, fk[:, s, :])
        cur = acc.reshape(-1)
        for lp in pl.levels:
            cur = mono_gather(lp, cur.reshape(-1), np.float32(0),
                              fold=fold).reshape(-1)
        pad = 8 * m1 - cur.shape[0]
        return jnp.concatenate([cur, jnp.zeros(pad, jnp.float32)])
    timed_loop(folds, plan, f0, args.iters, "fold cascade (all levels)")

    # placement (carry must keep f0's type: pad y back to 8*m1)
    def places(pl, f):
        cur = f.reshape(m1 // 128, 8, 128)[:, 0, :].reshape(-1)
        for lp in pl.levels:
            cur = mono_gather(lp, cur.reshape(-1), np.float32(0),
                              fold=fold).reshape(-1)
        y = mono_gather(pl.places[0], cur.reshape(-1),
                        np.float32(0)).reshape(-1)[:pl.nrows]
        return jnp.concatenate(
            [y, jnp.zeros(8 * m1 - pl.nrows, jnp.float32)])
    timed_loop(places, plan, f0, args.iters, "folds+placement")


if __name__ == "__main__":
    main()
