"""Device vs host eWise engine at GAP scale (VERDICT r3 item 3).

Times eadd (union) of two ~16M-nnz canonical COOs:
  - host:   core/coosparse.ewise (native single-pass merges)
  - device: core/dewise kernel, (a) end-to-end eager incl. transfers,
            (b) steady-state in a compiled loop with device-resident
            inputs (the deployment shape: operands already on chip).

Run: python perf/dewise_bench.py [--nnz 16000000]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nnz", type=int, default=16_000_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pygraphblas_tpu.core import coosparse as ck
    from pygraphblas_tpu.core import dewise as dw

    rng = np.random.RandomState(0)
    n = 1 << 24

    def make(seed):
        rr = np.random.RandomState(seed)
        k = np.unique(
            rr.randint(0, n, args.nnz, dtype=np.int64) * n
            + rr.randint(0, n, args.nnz, dtype=np.int64))
        return (k // n).astype(np.int64), (k % n).astype(np.int64), \
            rr.rand(len(k)).astype(np.float32)

    ra, ca, va = make(1)
    rb, cb, vb = make(2)
    print(f"nnz_a={len(ra)} nnz_b={len(rb)}", flush=True)
    fn = lambda x, y: x + y

    # host engine
    t0 = time.perf_counter()
    hr, hc, hv = ck.ewise(ra, ca, va, rb, cb, vb,
                          lambda x, y: x + y, np.float32, union=True)
    t_host = time.perf_counter() - t0
    print(f"host merge (coosparse.ewise): {t_host:.3f}s", flush=True)

    # device engine, end-to-end (includes host->device transfers)
    t0 = time.perf_counter()
    dr, dc, dv = dw.ewise(ra, ca, va, rb, cb, vb, fn, ("plus",),
                          np.float32, np.float32, union=True)
    t_dev_e2e = time.perf_counter() - t0
    print(f"device engine end-to-end (cold): {t_dev_e2e:.3f}s", flush=True)
    t0 = time.perf_counter()
    dr, dc, dv = dw.ewise(ra, ca, va, rb, cb, vb, fn, ("plus",),
                          np.float32, np.float32, union=True)
    t_dev_e2e = time.perf_counter() - t0
    print(f"device engine end-to-end (warm): {t_dev_e2e:.3f}s", flush=True)

    assert len(dr) == len(hr) and np.array_equal(dr, hr) \
        and np.array_equal(dc, hc) and np.allclose(dv, hv, rtol=1e-6), \
        "device/host results differ"

    # device kernel steady-state: device-resident operands, compiled loop
    r, c, t, v = dw._pad_tagged(ra, ca, va, rb, cb, vb,
                                np.dtype(np.float32))
    kern = dw._ewise_kernel(dw._FnKey(fn, ("plus",)), True,
                            "<f4", "<f4")
    rj, cj, tj, vj = map(jnp.asarray, (r, c, t, v))
    out = kern(rj, cj, tj, vj)
    jax.block_until_ready(out)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = kern(rj, cj, tj, vj)
    float(jnp.sum(out[3].astype(np.float32)))
    t_kern = (time.perf_counter() - t0) / iters
    print(f"device kernel steady-state: {t_kern:.3f}s/op "
          f"({(len(ra)+len(rb))/t_kern/1e6:.0f}M elem/s)", flush=True)
    print(f"speedup host/device-kernel: {t_host/t_kern:.1f}x", flush=True)


if __name__ == "__main__":
    main()
