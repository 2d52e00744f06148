"""Benchmark driver: masked semiring SpMV (PageRank) nnz/s on a
GAP-style kron (RMAT) graph, run through the library's sparse execution
path on the available accelerator.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "nnz/s", "vs_baseline": N}

The headline line is emitted IMMEDIATELY after the PageRank phase is
measured (round-2 lesson: a late print loses the whole run to an outer
timeout).  Secondary workloads (BFS / triangle count / BC / k-truss —
BASELINE configs 1-3) run afterwards as best-effort under a remaining-
time budget and are written to BENCH_EXTRAS.json + stderr, never stdout.

The reference publishes no numbers (BASELINE.md); vs_baseline is
reported against a nominal 1.0.
"""

import json
import os
import sys
import time

import numpy as np

_T0 = time.time()
# total inner budget: the headline is typically out after ~3 min warm;
# extras consume whatever remains of this.
_TOTAL = float(os.environ.get("BENCH_TOTAL_DEADLINE", "820"))


def _remaining():
    return _TOTAL - (time.time() - _T0)


def _note(msg):
    print(f"# [{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _enable_compile_cache():
    """Persistent XLA compilation cache: reruns of the same executables
    (driver bench after an in-round warmup) skip the ~60s compiles."""
    try:
        import jax

        if os.environ.get("BENCH_FORCE_CPU") == "1":  # harness testing
            jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("PYGB_XLA_CACHE",
                                         "/tmp/pygb_xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never a failure
        _note(f"compile cache unavailable: {e!r}")


def _watchdog(timeout_s, what):
    """Hard exit(17) if the current phase doesn't finish in time: the
    remote-TPU tunnel can wedge a client connection mid-run (blocks
    forever at 0%% CPU); exit 17 tells the supervisor to retry in a
    fresh process NOW instead of losing the whole deadline (the round-2
    failure mode, VERDICT r2 weak #1)."""
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(timeout_s):
            _note(f"WATCHDOG: {what} did not finish in {timeout_s:.0f}s "
                  "- assuming wedged tunnel; exiting for fresh retry")
            os._exit(17)

    threading.Thread(target=watch, daemon=True).start()
    return done


def _xspmv_plan_cached(A):
    """True when the transposed-orientation FP32 xspmv plan (the one
    fused.pagerank builds) is already in the disk cache."""
    try:
        from pygraphblas_tpu.core.xspmv import XSpmvPlan

        r, c, v = A._coo()
        path = XSpmvPlan.cache_path(c, r, v, A.ncols, A.nrows,
                                    np.float32)
        return bool(path and os.path.exists(path))
    except Exception:
        return False


def main():
    scale = int(os.environ.get("BENCH_SCALE", "20"))
    edgefactor = int(os.environ.get("BENCH_EDGEFACTOR", "16"))
    # 200 iterations: the remote-tunnel dispatch costs ~30ms per loop
    # launch, which at 50 iters inflates every per-iter number by
    # ~0.6ms (20% at the current ~3ms/iter).  The metric is steady-state
    # SpMV throughput, so amortize the fixed launch cost properly.
    iters = int(os.environ.get("BENCH_ITERS", "200"))

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    # first-transfer canary: a wedged tunnel blocks here, not 10 min in.
    # A COLD tunnel can legitimately take ~250s to first result (r5
    # measurement), so the first attempt waits longer; retries assume
    # the server side is warm and give up faster.
    attempt = int(os.environ.get("BENCH_ATTEMPT", "0"))
    canary_budget = 300 if attempt == 0 else 120
    canary_budget = min(canary_budget, max(_remaining() - 120, 60))
    t0 = time.perf_counter()
    done = _watchdog(canary_budget, "first device transfer")
    canary = float(jnp.arange(8.0).sum())
    done.set()
    _note(f"device canary ok ({canary}) in "
          f"{time.perf_counter() - t0:.1f}s")

    if jax.default_backend() == "cpu":
        # tunnel-outage fallback (or harness testing): a recorded CPU
        # number beats an empty benchmark artifact.  Time the planless
        # COO engine — the library's instant-start tier — and say so in
        # the metric name.
        return _main_cpu_fallback(scale, edgefactor, iters)

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
    plan_cached = _xspmv_plan_cached(A)
    if not plan_cached and _remaining() < 420:
        # cold plan cache + not enough budget to build one: the csr8
        # engine needs no plan and still lands a DEVICE number
        # (VERDICT r4 next #4: cheap device tier before CPU fallback)
        _note("plan cache cold and budget short: forcing csr8 engine")
        from pygraphblas_tpu import options_set
        options_set(spmv_engine="csr8")
    _note(f"graph ready: n={n} nnz={nnz}; plan_cached={plan_cached}; "
          "building/loading SpMV plan (minutes when cold)...")

    # whole-loop-fused PageRank: the iteration loop is a single XLA
    # executable over the cached plan (fused.py); tol=-1 forces exactly
    # `iters` iterations for a clean nnz/s measurement (fp32 PageRank
    # reaches an EXACT fixpoint near iter ~75, so tol=0's rdiff>0 exit
    # fires early and would inflate the per-iteration metric).  The first run
    # pays one-time plan/compile/transfer costs; report the best of
    # three steady-state runs.
    def timed():
        start = time.perf_counter()
        r = fused.pagerank(A, itermax=iters, tol=-1.0)
        float(jnp.sum(r._vals))  # hard sync through the host
        return time.perf_counter() - start

    def _integrity_check():
        """Cross-check 5 fused-engine iterations against the planless
        COO loop (plain gather + segment-sum — no custom kernels).  A
        kernel that compiles wrong on this backend must degrade the
        number, never corrupt it."""
        import jax.numpy as _jnp
        from pygraphblas_tpu.fused import _pagerank_loop_coo, _deg_vec

        r5 = fused.pagerank(A, itermax=5, tol=0.0)
        rows_d, cols_d, _ = A._device_coo()
        deg = _deg_vec(A)
        d_inv = _jnp.where(deg > 0, 0.85 / _jnp.maximum(deg, 1.0), 0.0)
        ref, _, _ = _pagerank_loop_coo(
            rows_d, cols_d, n, 5, d_inv.astype(_jnp.float32),
            _jnp.float32(0.15 / n), _jnp.float32(0.0))
        err = float(_jnp.max(_jnp.abs(r5._vals - ref)))
        scale_ = float(_jnp.max(_jnp.abs(ref)))
        _note(f"integrity check: max |fused - coo| = {err:.2e} "
              f"(max rank {scale_:.2e})")
        # fp32 reduction-order noise across engines is ~1e-5 relative;
        # kernel corruption is O(1) relative
        if not err < 1e-3 * scale_:
            raise AssertionError(f"fused pagerank diverges from the "
                                 f"planless oracle by {err}")

    _note("warmup (plan build/load + compile + transfer)...")
    t0 = time.perf_counter()
    done = _watchdog(max(_remaining() - 90, 120), "pagerank warmup")
    try:
        timed()  # compile + transfer warmup
        _integrity_check()
    except Exception as e:
        # a kernel regression must degrade the number, never lose or
        # corrupt it: retry the warmup on the fallback engine
        _note(f"xspmv warmup FAILED ({e!r}); falling back to csr8")
        from pygraphblas_tpu import options_set
        options_set(spmv_engine="csr8")
        timed()
        _integrity_check()
    done.set()
    _note(f"warmup done in {time.perf_counter() - t0:.1f}s; timing...")
    done = _watchdog(max(min(_remaining() - 30, 450), 90),
                     "pagerank timing runs")
    elapsed = min(timed() for _ in range(3))
    done.set()
    _note(f"pagerank timed: {elapsed:.3f}s")
    nnz_per_s = nnz * iters / elapsed

    # THE one stdout line — out the door before anything else runs
    print(json.dumps({
        "metric": f"pagerank_spmv_kron_s{scale}_ef{edgefactor}",
        "value": nnz_per_s,
        "unit": "nnz/s",
        "vs_baseline": 1.0,
    }), flush=True)

    if os.environ.get("BENCH_EXTRAS", "1") == "1":
        extras = bench_extras()
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_EXTRAS.json")
        with open(path, "w") as f:
            json.dump(extras, f, indent=1)
        _note("extras: " + json.dumps(extras))


def _main_cpu_fallback(scale, edgefactor, iters):
    """Headline number on the CPU backend via the planless fused COO
    PageRank loop (fused._pagerank_loop_coo — the same library tier the
    async first-touch path runs).  Used when the TPU tunnel is down for
    the whole driver window: the metric name carries a `_cpuhost`
    suffix so a host number is never mistaken for a device one."""
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
    _note(f"CPU fallback: graph ready n={n} nnz={nnz}")

    rows_d, cols_d, _ = A._device_coo()
    deg = fused._deg_vec(A)
    d_inv = jnp.where(deg > 0, 0.85 / jnp.maximum(deg, 1.0), 0.0)

    def timed():
        start = time.perf_counter()
        r, _, _ = fused._pagerank_loop_coo(
            rows_d, cols_d, n, iters, d_inv.astype(jnp.float32),
            jnp.float32(0.15 / n), jnp.float32(0.0))
        float(jnp.sum(r))
        return time.perf_counter() - start

    done = _watchdog(max(_remaining() - 60, 120), "cpu pagerank")
    timed()  # compile warmup
    elapsed = min(timed() for _ in range(2))
    done.set()
    _note(f"cpu pagerank timed: {elapsed:.3f}s")
    print(json.dumps({
        "metric": f"pagerank_spmv_kron_s{scale}_ef{edgefactor}_cpuhost",
        "value": nnz * iters / elapsed,
        "unit": "nnz/s",
        # fallback metric: not comparable to the device headline
        "vs_baseline": None,
    }), flush=True)


def bench_extras():
    """Secondary BASELINE configs, each best-effort under the remaining
    time budget: fused BFS (config[1]), triangle counting + k-truss at
    kron-16/14 (config[2]), batched BC (config[3])."""
    import jax.numpy as jnp

    from pygraphblas_tpu import types, fused
    from pygraphblas_tpu.algorithms import (triangle_count, bfs_level,
                                            k_truss)
    from pygraphblas_tpu.generators import rmat_edges, to_matrix

    out = {}

    def _sym_kron(scale):
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

    def run(name, min_budget, fn):
        rem = _remaining()
        if rem < min_budget:
            _note(f"extras: skipping {name} ({rem:.0f}s left, "
                  f"needs ~{min_budget}s)")
            out[name] = {"skipped": f"{rem:.0f}s remaining"}
            return
        _note(f"extras: {name}...")
        try:
            out[name] = fn()
        except Exception as e:
            _note(f"extras: {name} FAILED: {e!r}")
            out[name] = {"error": repr(e)}

    # --- fused BFS at kron-18 (low diameter, dense-frontier loop) ----
    def _bfs():
        scale = int(os.environ.get("BENCH_BFS_SCALE", "18"))
        cache = f"/tmp/pygb_bench_kron_s{scale}_ef16.npz"
        if os.path.exists(cache):
            d = np.load(cache)
            rows, cols, n = d["rows"], d["cols"], int(d["n"])
        else:
            rows, cols, n = rmat_edges(scale, 16)
            np.savez(cache, rows=rows, cols=cols, n=n)
        A = to_matrix(rows, cols, n, types.BOOL)
        # GAP protocol: multiple source trials per graph.  Batching the
        # trials into one executable amortizes the ~30ms per-dispatch
        # tunnel latency that otherwise dominates a ~10ms traversal.
        K = int(os.environ.get("BENCH_BFS_SOURCES", "16"))
        srcs = list(range(K))
        t0 = time.perf_counter()
        lvb = fused.bfs_batch(A, srcs)
        float(jnp.sum(lvb))
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        lvb = fused.bfs_batch(A, srcs)
        float(jnp.sum(lvb))
        t_warm = time.perf_counter() - t0
        # integrity: trial 0 of the batch == the single-source loop
        lv0 = fused.bfs_level(A, 0)
        ok = bool(jnp.array_equal(
            lvb[0], jnp.asarray(lv0.to_numpy(), lvb.dtype)))
        t0 = time.perf_counter()
        lv = fused.bfs_level(A, 1)
        float(jnp.sum(lv._vals))
        t_single = time.perf_counter() - t0
        return {"edges_per_s": K * len(rows) / t_warm,
                "single_dispatch_s": t_single, "sources": K,
                "batch_matches_single": ok, "first_s": t_first,
                "scale": scale}

    run("bfs_fused_kron", 120, _bfs)

    # --- triangle counting at kron-16 (masked SpGEMM, config[2]) -----
    def _tc():
        scale = int(os.environ.get("BENCH_TC_SCALE", "16"))
        rows, cols, n = _sym_kron(scale)
        A = to_matrix(rows, cols, n, types.INT64)
        t0 = time.perf_counter()
        ntri = triangle_count(A, "sandia")
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        ntri = triangle_count(A, "sandia")   # warm: executables cached
        t_tc = time.perf_counter() - t0
        return {"edges_per_s": len(rows) / t_tc, "triangles": int(ntri),
                "seconds": t_tc, "first_s": t_first, "scale": scale}

    run("tc_kron", 150, _tc)

    # --- k-truss at kron-14 (VERDICT r2 #7: prove the recompile fix) --
    def _ktruss():
        scale = int(os.environ.get("BENCH_KT_SCALE", "14"))
        rows, cols, n = _sym_kron(scale)
        A = to_matrix(rows, cols, n, types.INT64)
        t0 = time.perf_counter()
        t4 = k_truss(A, 4)
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        t4 = k_truss(A, 4)
        t_warm = time.perf_counter() - t0
        return {"first_s": t_first, "warm_s": t_warm,
                "nnz_4truss": int(t4.nvals), "scale": scale}

    run("ktruss_kron", 120, _ktruss)

    # --- batched betweenness centrality (config[3]) ------------------
    def _bc():
        scale = int(os.environ.get("BENCH_TC_SCALE", "16"))
        rows, cols, n = _sym_kron(scale)
        Af = to_matrix(rows, cols, n, types.FP32)
        t0 = time.perf_counter()
        bcv = fused.bc(Af, [0, 1, 2, 3])
        float(jnp.sum(bcv._vals))
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        bcv = fused.bc(Af, [4, 5, 6, 7])
        float(jnp.sum(bcv._vals))
        t_bc = time.perf_counter() - t0
        return {"seconds": t_bc, "first_s": t_first, "scale": scale}

    run("bc4_kron", 120, _bc)
    return out


def supervised():
    """Run main() in a child process, streaming its output; echo the
    headline JSON the INSTANT it appears so an outer timeout can no
    longer lose the number.  One retry if the child dies or wedges
    before producing the headline (the remote-TPU tunnel occasionally
    wedges a single client connection; a fresh process reconnects)."""
    import subprocess
    import threading

    deadline = float(os.environ.get("BENCH_DEADLINE", "880"))
    start = time.time()
    headline = []

    attempts = 3
    for attempt in range(attempts):
        remaining = deadline - (time.time() - start)
        if remaining < 90:
            break
        # never let a non-final attempt eat the whole deadline: a wedged
        # tunnel must always leave a fresh process enough budget
        att_budget = remaining if attempt == attempts - 1 \
            else min(remaining, max(remaining * 0.55, 300))
        env = dict(os.environ, BENCH_INNER="1",
                   BENCH_ATTEMPT=str(attempt),
                   BENCH_TOTAL_DEADLINE=str(max(att_budget - 15, 60)))
        if attempt == attempts - 1 and os.environ.get(
                "BENCH_FORCE_CPU") != "1":
            # two device attempts died (wedged/offline tunnel): the last
            # attempt must land SOME number — force the CPU backend
            print("# final attempt: forcing CPU backend (device attempts "
                  "produced no headline)", file=sys.stderr, flush=True)
            env["BENCH_FORCE_CPU"] = "1"
        proc = subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__)],
            env=env, stdout=subprocess.PIPE, stderr=None, text=True,
            bufsize=1)
        timer = threading.Timer(att_budget, proc.kill)
        timer.start()
        try:
            for line in proc.stdout:
                line = line.rstrip("\n")
                if line.startswith("{") and not headline:
                    print(line, flush=True)   # the number is now safe
                    headline.append(line)
                else:
                    print(line, file=sys.stderr, flush=True)
            proc.wait()
        finally:
            timer.cancel()
            if proc.poll() is None:
                proc.kill()
        if headline:
            return
        print(f"# attempt {attempt}: exit {proc.returncode} with no "
              "headline; retrying in a fresh process",
              file=sys.stderr, flush=True)
    raise SystemExit("bench failed: no headline produced within deadline")


if __name__ == "__main__":
    if os.environ.get("BENCH_INNER"):
        main()
    else:
        supervised()
