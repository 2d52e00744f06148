"""Distributed-tier scaling evidence for the BASELINE ≥70% target.

Measures, on meshes of P ∈ {1,2,4,8} virtual CPU devices over the SAME
graph:

1. per-iteration wall of the distributed PageRank step (2-D block SpMV
   + psum + resharding collectives) and the aggregate nnz/s;
2. **per-iteration communication volume**, extracted from the compiled
   HLO: every all-reduce / all-gather / collective-permute /
   all-to-all instruction's result bytes (per participating device);
3. an **ICI cost model** projecting pod-slice scaling efficiency from
   (2) plus the measured single-chip SpMV rate — the honest substitute
   for a real multi-chip run, which this environment cannot provide
   (one tunneled v5e chip only).

On this 1-core build host all virtual devices share one core, so
*speedup* is unmeasurable; the wall-clock table records **overhead
conservation** (t(P)/t(1) ≈ 1 means the partitioned executor adds no
redundant work).  The cost model is what predicts real efficiency:

    T_comp(P) = (nnz / P) / R_chip        R_chip = measured nnz/s
    T_comm(P) = bytes_per_device(P) / BW_ici
    eff(P)    = T_comp(P) / max(T_comp(P), T_comm(P))
                                  (compute/comm overlap; ring ICI)

Writes perf/SCALING.json next to this file.

Run: python perf/dist_scaling.py [scale]
"""

import json
import os
import re
import sys
import time
from pathlib import Path

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

# measured single-chip xspmv rate (BENCH_r04 headline, kron-20) and
# v5e ICI: 4 links x ~45 GB/s usable per direction, ring topology.
R_CHIP = 5.99e9          # nnz/s (BENCH_r05 headline)
BW_ICI = 4.5e10          # bytes/s per device (one link direction)

_DTYPE_BYTES = {
    "f32": 4, "f64": 8, "s32": 4, "s64": 8, "u32": 4, "u64": 8,
    "f16": 2, "bf16": 2, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
    "pred": 1,
}

_COLL_RE = re.compile(
    r"(all-reduce|all-gather|collective-permute|all-to-all)"
    r"(?:-start)?\(")
_SHAPE_RE = re.compile(r"= \(?([a-z0-9]+)\[([0-9,]*)\]")


def hlo_comm_bytes(compiled):
    """Sum result bytes of every collective in the compiled HLO.

    The result shape is per-participant, so this is bytes RECEIVED per
    device per execution (all-reduce counts once; a bidirectional-ring
    implementation moves ~2(P-1)/P of it, which the cost model folds
    into BW_ICI's usable fraction)."""
    total = 0
    ops = {}
    for ln in compiled.as_text().splitlines():
        m = _COLL_RE.search(ln)
        if not m:
            continue
        # sum EVERY result shape on the line: tuple-shaped results
        # (multi-operand all-reduce, collective-permute-start pairs)
        # contribute each element (advisor r4 low)
        if "=" not in ln:
            continue
        result_part = ln.split("=", 1)[1].split(m.group(0))[0]
        b = 0
        for dt, dims in re.findall(r"([a-z0-9]+)\[([0-9,]*)\]",
                                   result_part):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            b += n * _DTYPE_BYTES[dt]
        if not b:
            continue
        total += b
        ops[m.group(1)] = ops.get(m.group(1), 0) + b
    return total, ops


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


def measure_overlap(n=1024, nnz=20000, seed=0):
    """MEASURED comm/compute overlap (VERDICT r4 next #3): AOT-compile
    the library's actual ring triangle-count kernel for a REAL
    v5e:2x4 8-chip TPU topology (no hardware needed — the compiler
    service accepts topology descriptions) and inspect the optimized
    schedule: every `collective-permute-start` should be separated
    from its `-done` by local compute instructions, i.e. XLA's
    latency-hiding scheduler overlaps the ring permute with the local
    intersect work.  Returns schedule statistics; this replaces the
    'assume overlapped' flag in the ICI model with evidence."""
    from pygraphblas_tpu.parallel.dist import make_mesh, \
        dist_triangle_count

    try:
        from jax.experimental import topologies
        topo = topologies.get_topology_desc("v5e:2x4", platform="tpu")
    except Exception as e:  # no compiler service: skip, don't fail
        return {"error": f"tpu topology unavailable: {e!r}"}
    from jax.sharding import Mesh
    tmesh = Mesh(np.array(topo.devices), ("p",))

    captured = []
    orig = jax.shard_map

    def cap(f, mesh=None, in_specs=None, out_specs=None, **kw):
        sm = orig(f, mesh=mesh, in_specs=in_specs,
                  out_specs=out_specs, **kw)

        def wrapper(*a):
            captured.append((f, in_specs, out_specs, tuple(
                jax.ShapeDtypeStruct(x.shape, x.dtype) for x in a)))
            return sm(*a)

        return wrapper

    rng = np.random.RandomState(seed)
    r = rng.randint(0, n, nnz)
    c = rng.randint(0, n, nnz)
    keep = r != c
    keys = np.unique(r[keep] * n + c[keep])
    r, c = keys // n, keys % n
    jax.shard_map = cap
    try:
        dist_triangle_count(make_mesh(8), n,
                            np.concatenate([r, c]),
                            np.concatenate([c, r]))
    finally:
        jax.shard_map = orig
    f, ins, outs, shapes = captured[-1]
    comp = jax.jit(orig(f, mesh=tmesh, in_specs=ins,
                        out_specs=outs)).lower(*shapes).compile()
    lines = comp.as_text().splitlines()
    starts = [i for i, l in enumerate(lines)
              if "collective-permute-start" in l]
    dones = [i for i, l in enumerate(lines)
             if "collective-permute-done" in l]
    pairs = []
    for s in starts:
        later = [x for x in dones if x > s]
        if not later:
            continue
        d = min(later)
        between = lines[s + 1:d]
        comp_n = sum(1 for l in between if re.search(
            r"(sort|fusion|reduce|dynamic-slice|gather|add|multiply|"
            r"select|compare)", l))
        pairs.append({"start_line": s, "done_line": d,
                      "instrs_between": d - s - 1,
                      "compute_between": comp_n})
    overlapped = [p for p in pairs if p["compute_between"] > 0]
    return {
        "topology": "v5e:2x4 (AOT schedule)",
        "kernel": "dist_triangle_count ring (lax.ppermute circulation)",
        "permute_start_done_pairs": len(pairs),
        "pairs_with_compute_between": len(overlapped),
        "mean_instrs_between": (sum(p["instrs_between"] for p in pairs)
                                / len(pairs)) if pairs else 0,
        "mean_compute_between": (sum(p["compute_between"]
                                     for p in pairs)
                                 / len(pairs)) if pairs else 0,
        "overlap_demonstrated": bool(overlapped),
        "pairs": pairs[:8],
    }


def main(scale=16):
    from functools import partial

    from pygraphblas_tpu.parallel.dist import (DistSpMV, make_mesh,
                                               dist_triangle_count)
    from pygraphblas_tpu.parallel import dist as dd

    n, rows, cols = rmat(scale)
    nnz = len(rows)
    print(f"graph: n=2^{scale}, nnz={nnz}")
    record = {"scale": scale, "nnz": nnz, "r_chip_nnz_s": R_CHIP,
              "bw_ici_bytes_s": BW_ICI, "points": []}
    results = {}
    for Pn in (1, 2, 4, 8):
        mesh = make_mesh(Pn)
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
        compiled = step.lower(r, d_inv, tele).compile()
        comm_bytes, comm_ops = hlo_comm_bytes(compiled)

        r1, _ = compiled(r, d_inv, tele)      # warm
        jax.block_until_ready(r1)
        iters = 10
        t0 = time.time()
        rr = r
        for _ in range(iters):
            rr, rd = compiled(rr, d_inv, tele)
        jax.block_until_ready(rr)
        dt = (time.time() - t0) / iters
        results[Pn] = dt

        # ICI cost model (per device, per iteration)
        t_comp = (nnz / Pn) / R_CHIP
        t_comm = comm_bytes / BW_ICI
        eff_ov = t_comp / max(t_comp, t_comm) if Pn > 1 else 1.0
        eff_no = t_comp / (t_comp + t_comm) if Pn > 1 else 1.0
        point = {
            "P": Pn, "mesh": [mesh.shape["i"], mesh.shape["j"]],
            "ms_per_iter_host": dt * 1e3,
            "overhead_tP_over_t1": results[Pn] / results[1],
            "aggregate_Mnnz_s_host": nnz / dt / 1e6,
            "comm_bytes_per_dev_per_iter": comm_bytes,
            "comm_ops": comm_ops,
            "model_t_comp_us": t_comp * 1e6,
            "model_t_comm_us": t_comm * 1e6,
            "model_ici_efficiency_overlapped": eff_ov,
            "model_ici_efficiency_serial": eff_no,
        }
        record["points"].append(point)
        print(f"P={Pn}: {dt*1e3:8.2f} ms/iter  t(P)/t(1)="
              f"{results[Pn]/results[1]:5.2f}  comm/dev="
              f"{comm_bytes/1024:.0f} KiB {comm_ops}  "
              f"model eff={eff_ov*100:.0f}%/{eff_no*100:.0f}%")

    # projection to the GAP headline workload (kron-20 ef16): comm
    # volume scales with the vector length N (the collectives move
    # vector blocks, never edge data); compute scales with nnz.
    NN, ZZ = 1 << 20, 16_084_596
    record["projection_kron20_ef16"] = []
    for pt in record["points"]:
        if pt["P"] == 1:
            continue
        bytes20 = pt["comm_bytes_per_dev_per_iter"] * NN / (n)
        tc20 = (ZZ / pt["P"]) / R_CHIP
        tm20 = bytes20 / BW_ICI
        record["projection_kron20_ef16"].append({
            "P": pt["P"],
            "comm_bytes_per_dev": bytes20,
            "t_comp_us": tc20 * 1e6, "t_comm_us": tm20 * 1e6,
            "eff_overlapped": tc20 / max(tc20, tm20),
            "eff_serial": tc20 / (tc20 + tm20),
        })
        print(f"kron-20 projection P={pt['P']}: comm/dev "
              f"{bytes20/1024:.0f} KiB  eff "
              f"{100*tc20/max(tc20,tm20):.0f}% overlapped / "
              f"{100*tc20/(tc20+tm20):.0f}% serial")

    if "tc" in sys.argv:
        # distributed TC wall (P=8) — optional, slow on the 1-core host
        mesh = make_mesh(8)
        t0 = time.time()
        tc = dist_triangle_count(mesh, n, np.concatenate([rows, cols]),
                                 np.concatenate([cols, rows]))
        tc_s = time.time() - t0
        record["dist_tc_P8"] = {"triangles": int(tc), "seconds": tc_s}
        print(f"dist TC (P=8): {tc} triangles in {tc_s:.1f}s")

    record["measured_overlap"] = measure_overlap()
    mo = record["measured_overlap"]
    if "error" not in mo:
        print(f"measured overlap (v5e:2x4 AOT schedule): "
              f"{mo['pairs_with_compute_between']}/"
              f"{mo['permute_start_done_pairs']} permute pairs have "
              f"compute scheduled between start and done "
              f"(mean {mo['mean_compute_between']:.0f} compute instrs)")

    out = Path(__file__).parent / "SCALING.json"
    out.write_text(json.dumps(record, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 16)
