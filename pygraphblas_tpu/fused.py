"""Fused whole-algorithm kernels: one jit-compiled XLA program per
algorithm, with the iteration loop as ``lax.while_loop`` on device.

The eager container API dispatches one compiled kernel per GraphBLAS
call — convenient, but each dispatch pays host->device latency and
prevents cross-op fusion.  For the iterative workloads (PageRank, BFS,
SSSP) this module compiles the ENTIRE loop into a single executable over
the matrix's cached csr8 SpMV plan (core/csr8.py): zero per-iteration
dispatches, XLA fusion across the update expressions, and convergence
checks staying on device.  This is the TPU-native "production path";
results match the eager `algorithms` implementations.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .vector import Vector
from .core import csr8
from .core import xspmv as xs
from .base import config
from . import types

__all__ = ["pagerank", "bfs_level", "bfs_frontier", "sssp", "bc", "dnn"]


def _xspmv_ok(A, semiring, dtype):
    if config.spmv_engine == "csr8":
        return False
    if config.spmv_engine == "xspmv":
        return True
    return xs.supported(semiring, dtype, A.nvals)


def _plan_args(A, transpose):
    plan = A._spmv_plan(transpose)
    return plan, (plan.cols_p, plan.vals_p, tuple(plan.levels),
                  plan.final_src)


def _spmv(plan_cols, plan_vals, levels, final_src, n_blocks, x, mul, add,
          ident, ident_x):
    """Semiring SpMV over csr8 plan arrays with dense x."""

    class _P:
        pass

    plan = _P()
    plan.n_blocks = n_blocks
    plan.levels = levels
    plan.final_src = final_src
    x_ext = jnp.concatenate([x, ident_x[None]])
    xe = x_ext[plan_cols]
    prod = mul(plan_vals, xe)
    return csr8.reduce_partials(plan, prod, add, ident)


@partial(jax.jit, static_argnames=("n", "n_blocks", "itermax"))
def _pagerank_loop(plan_cols, plan_vals, levels, final_src, n_blocks,
                   n, itermax, d_inv_damped, teleport, tol):
    r0 = jnp.full((n,), 1.0 / n, jnp.float32)

    def cond(carry):
        r, rdiff, i = carry
        return jnp.logical_and(rdiff > tol, i < itermax)

    def body(carry):
        r, _, i = carry
        w = r * d_inv_damped
        contrib = _spmv(plan_cols, plan_vals, levels, final_src, n_blocks,
                        w, lambda a, x: x, "PLUS", jnp.float32(0.0),
                        jnp.float32(0.0))
        r_new = teleport + contrib
        rdiff = jnp.sum(jnp.abs(r_new - r))
        return r_new, rdiff, i + 1

    r, rdiff, iters = jax.lax.while_loop(cond, body,
                                         (r0, jnp.float32(np.inf),
                                          jnp.int32(0)))
    return r, rdiff, iters


@partial(jax.jit, static_argnames=("n", "itermax"))
def _pagerank_loop_coo(rows, cols, n, itermax, d_inv_damped, teleport,
                       tol):
    """Planless PageRank loop over raw COO triples (gather+segment-sum).

    The instant-start tier under ``spmv_plan_async``: no plan build of
    any kind, so a fresh GAP-scale matrix starts iterating in seconds
    while the xspmv plan builds in the background."""
    r0 = jnp.full((n,), 1.0 / n, jnp.float32)

    def cond(carry):
        r, rdiff, i = carry
        return jnp.logical_and(rdiff > tol, i < itermax)

    def body(carry):
        r, _, i = carry
        w = r * d_inv_damped
        contrib = jax.ops.segment_sum(w[rows], cols, num_segments=n)
        r_new = teleport + contrib
        return r_new, jnp.sum(jnp.abs(r_new - r)), i + 1

    return jax.lax.while_loop(cond, body,
                              (r0, jnp.float32(np.inf), jnp.int32(0)))


def _deg_vec(A):
    n = A.nrows
    if A._ell_c is None:
        A._ell_c = {}
    if "deg" not in A._ell_c:
        r_host, _, _ = A._coo()
        deg_h = np.zeros(n, np.float32)
        np.add.at(deg_h, r_host, 1.0)
        A._ell_c["deg"] = jnp.asarray(deg_h)
    return A._ell_c["deg"]


def pagerank(A, damping=0.85, itermax=100, tol=1e-4):
    """Whole-loop-fused PageRank; returns a dense FP32 Vector.

    Single compiled executable: per-iteration cost is pure kernel time.
    Uses the gather-free xspmv engine (core/xspmv.py) when supported.
    """
    n = A.nrows
    sem = types.FP32.PLUS_SECOND
    plan = waiting = None
    if _xspmv_ok(A, sem, np.float32):
        plan = A._xspmv_plan(True, np.float32,  # y = A^T w
                             async_build=config.spmv_plan_async)
        waiting = plan is None
        if waiting:  # build in flight: run the instant COO tier
            rows, cols, _ = A._device_coo()
            deg = _deg_vec(A)
            d_inv = jnp.where(deg > 0, damping / jnp.maximum(deg, 1.0),
                              0.0)
            r, rdiff, iters = _pagerank_loop_coo(
                rows, cols, n, itermax, d_inv.astype(jnp.float32),
                jnp.float32((1 - damping) / n), jnp.float32(tol))
    if plan is not None:
        key = "fused_pr_x"
        if key not in A._ell_c:
            @partial(jax.jit, static_argnames=("itermax",))
            def loop(plan, d_inv_damped, teleport, tol, itermax):
                r0 = jnp.full((n,), 1.0 / n, jnp.float32)

                def cond(carry):
                    r, rdiff, i = carry
                    return jnp.logical_and(rdiff > tol, i < itermax)

                def body(carry):
                    r, _, i = carry
                    w = r * d_inv_damped
                    contrib, _ = xs.xspmv(plan, w, sem, np.float32)
                    r_new = teleport + contrib
                    return r_new, jnp.sum(jnp.abs(r_new - r)), i + 1

                return jax.lax.while_loop(
                    cond, body, (r0, jnp.float32(np.inf), jnp.int32(0)))

            A._ell_c[key] = loop
        deg = _deg_vec(A)
        d_inv = jnp.where(deg > 0, damping / jnp.maximum(deg, 1.0), 0.0)
        r, rdiff, iters = A._ell_c[key](
            plan, d_inv.astype(jnp.float32), jnp.float32((1 - damping) / n),
            jnp.float32(tol), itermax)
    elif not waiting:
        plan, args = _plan_args(A, True)  # transposed orientation
        deg = _deg_vec(A)
        d_inv = jnp.where(deg > 0, damping / jnp.maximum(deg, 1.0), 0.0)
        r, rdiff, iters = _pagerank_loop(
            args[0], args[1].astype(jnp.float32), args[2], args[3],
            plan.n_blocks, n, itermax, d_inv.astype(jnp.float32),
            jnp.float32((1 - damping) / n), jnp.float32(tol))
    out = Vector.sparse(types.FP32, n)
    out._set_dense(r, jnp.ones((n,), jnp.bool_))
    return out


@partial(jax.jit, static_argnames=("n", "n_blocks"))
def _bfs_loop(plan_cols, plan_pad, levels, final_src, n_blocks, n, start):
    lv = jnp.zeros((n,), jnp.int32)
    frontier = jnp.zeros((n,), jnp.bool_).at[start].set(True)

    def spmv_bool(front):
        class _P:
            pass

        plan = _P()
        plan.n_blocks = n_blocks
        plan.levels = levels
        plan.final_src = final_src
        f_ext = jnp.concatenate([front, jnp.zeros((1,), jnp.bool_)])
        fe = jnp.logical_and(f_ext[plan_cols], plan_pad).astype(jnp.int8)
        return csr8.reduce_partials(plan, fe, "LOR",
                                    jnp.asarray(0, jnp.int8)) > 0

    def cond(carry):
        lv, frontier, level = carry
        return jnp.logical_and(jnp.any(frontier), level <= n)

    def body(carry):
        lv, frontier, level = carry
        lv = jnp.where(frontier, level, lv)
        nxt = spmv_bool(frontier)
        nxt = jnp.logical_and(nxt, lv == 0)
        return lv, nxt, level + 1

    lv, _, _ = jax.lax.while_loop(cond, body, (lv, frontier, jnp.int32(1)))
    return lv


def bfs_level(A, start):
    """Whole-loop-fused level-synchronous BFS (vxm = transposed SpMV);
    returns an INT64 Vector of 1-based levels (unreached absent).

    The xspmv engine runs the boolean frontier step as MAX_SECOND over a
    0/1 fp32 frontier (LOR on {0,1} == MAX), keeping the whole loop in
    the gather-free pipeline."""
    n = A.nrows
    sem = types.FP32.MAX_SECOND
    if _xspmv_ok(A, sem, np.float32):
        plan = A._xspmv_plan(True, np.float32)
        key = "fused_bfs_x"
        if key not in A._ell_c:
            @jax.jit
            def loop(plan, start):
                lv = jnp.zeros((n,), jnp.int32)
                frontier = jnp.zeros((n,), jnp.float32).at[start].set(1.0)

                def cond(carry):
                    lv, frontier, level = carry
                    return jnp.logical_and(jnp.any(frontier > 0), level <= n)

                def body(carry):
                    lv, frontier, level = carry
                    lv = jnp.where(frontier > 0, level, lv)
                    nxt, _ = xs.xspmv(plan, frontier, sem, np.float32)
                    nxt = jnp.where(lv == 0, jnp.maximum(nxt, 0.0), 0.0)
                    return lv, nxt, level + 1

                lv, _, _ = jax.lax.while_loop(
                    cond, body, (lv, frontier, jnp.int32(1)))
                return lv

            A._ell_c[key] = loop
        lv = A._ell_c[key](plan, jnp.int32(start))
    else:
        plan, args = _plan_args(A, True)
        lv = _bfs_loop(args[0], plan.pad_mask, args[2], args[3],
                       plan.n_blocks, n, jnp.int32(start))
    lv = lv.astype(jnp.int64)
    out = Vector.sparse(types.INT64, n)
    out._set_dense(lv, lv > 0)
    return out


def bfs_batch(A, sources):
    """Batched whole-loop BFS: ONE executable runs a full BFS from each
    source in sequence on device (the GAP benchmark protocol runs 64
    source trials per graph; batching them amortizes the per-dispatch
    launch latency that dominates a single ~10ms traversal).

    Returns an int32 (K, n) device array of 1-based levels (0 =
    unreached).  Reference workload: SURVEY §3.3 / gap BFS."""
    n = A.nrows
    sem = types.FP32.MAX_SECOND
    if not _xspmv_ok(A, sem, np.float32):
        return jnp.stack([
            jnp.asarray(bfs_level(A, int(s)).to_numpy(), jnp.int32)
            for s in np.asarray(sources)])
    plan = A._xspmv_plan(True, np.float32)
    key = "fused_bfs_batch"
    if key not in A._ell_c:
        @jax.jit
        def batch(plan, srcs):
            def one(start):
                lv = jnp.zeros((n,), jnp.int32)
                frontier = jnp.zeros((n,), jnp.float32).at[start].set(1.0)

                def cond(carry):
                    lv, frontier, level = carry
                    return jnp.logical_and(jnp.any(frontier > 0),
                                           level <= n)

                def body(carry):
                    lv, frontier, level = carry
                    lv = jnp.where(frontier > 0, level, lv)
                    nxt, _ = xs.xspmv(plan, frontier, sem, np.float32)
                    nxt = jnp.where(lv == 0, jnp.maximum(nxt, 0.0), 0.0)
                    return lv, nxt, level + 1

                lv, _, _ = jax.lax.while_loop(
                    cond, body, (lv, frontier, jnp.int32(1)))
                return lv

            return jax.lax.map(one, srcs)

        A._ell_c[key] = batch
    return A._ell_c[key](plan, jnp.asarray(sources, jnp.int32))


@partial(jax.jit, static_argnames=("n", "n_blocks"))
def _sssp_loop(plan_cols, plan_vals, levels, final_src, n_blocks, n, start):
    dt = plan_vals.dtype
    inf = jnp.asarray(np.inf, dt)
    dist = jnp.full((n,), inf).at[start].set(0.0)

    def cond(carry):
        dist, changed, i = carry
        return jnp.logical_and(changed, i < n)

    def body(carry):
        dist, _, i = carry
        relax = _spmv(plan_cols, plan_vals, levels, final_src, n_blocks,
                      dist, lambda a, x: a + x, "MIN", inf, inf)
        new = jnp.minimum(dist, relax)
        return new, jnp.any(new < dist), i + 1

    dist, _, _ = jax.lax.while_loop(cond, body, (dist, True, jnp.int32(0)))
    return dist


def sssp(A, start):
    """Whole-loop-fused Bellman-Ford SSSP (min_plus); returns a Vector of
    distances (unreachable absent)."""
    n = A.nrows
    npdt = A.type._numpy_t
    sem = getattr(A.type, "MIN_PLUS", None)
    if sem is not None and np.dtype(npdt).kind == "f" \
            and _xspmv_ok(A, sem, npdt):
        plan = A._xspmv_plan(True, npdt)
        key = "fused_sssp_x"
        if key not in A._ell_c:
            @jax.jit
            def loop(plan, start):
                inf = jnp.asarray(np.inf, npdt)
                dist = jnp.full((n,), inf).at[start].set(0.0)

                def cond(carry):
                    dist, changed, i = carry
                    return jnp.logical_and(changed, i < n)

                def body(carry):
                    dist, _, i = carry
                    relax, _ = xs.xspmv(plan, dist, sem, npdt)
                    new = jnp.minimum(dist, relax)
                    return new, jnp.any(new < dist), i + 1

                d, _, _ = jax.lax.while_loop(cond, body,
                                             (dist, True, jnp.int32(0)))
                return d

            A._ell_c[key] = loop
        dist = A._ell_c[key](plan, jnp.int32(start))
        out = Vector.sparse(A.type, n)
        out._set_dense(dist.astype(A.type._jnp_dtype()), jnp.isfinite(dist))
        return out
    plan, args = _plan_args(A, True)
    dist = _sssp_loop(args[0], args[1], args[2], args[3], plan.n_blocks, n,
                      jnp.int32(start))
    out = Vector.sparse(A.type, n)
    out._set_dense(dist.astype(A.type._jnp_dtype()), jnp.isfinite(dist))
    return out


def bc(A, sources):
    """Whole-loop-fused batched Brandes betweenness centrality
    (reference workload: ``gap/bcmark.py:16-67``).

    Dense-state formulation: instead of a host-side stack of level
    pattern snapshots (the reference's ``S`` list), a per-vertex level
    map is carried on device, so forward + backward sweeps compile into
    one executable.  Each batched frontier step is `ns` gather-free
    SpMVs (PLUS_SECOND over the transpose plan forward, the forward
    plan backward).  Requires the xspmv engine; falls back to the eager
    algorithm otherwise."""
    from . import algorithms

    n = A.nrows
    ns = len(sources)
    sem = types.FP32.PLUS_SECOND
    if not _xspmv_ok(A, sem, np.float32) or A.nrows != A.ncols:
        return algorithms.betweenness_centrality(A, sources)
    plan_t = A._xspmv_plan(True, np.float32)   # y = A^T w  (forward)
    plan_f = A._xspmv_plan(False, np.float32)  # y = A w    (backward)
    key = ("fused_bc_x", ns)
    if key not in A._ell_c:
        def spmv_batch(plan, W):
            rows = []
            for s in range(ns):
                y, _ = xs.xspmv(plan, W[s], sem, np.float32)
                rows.append(y)
            return jnp.stack(rows)

        @jax.jit
        def loop(plan_t, plan_f, src_idx):
            paths = jnp.zeros((ns, n), jnp.float32)
            paths = paths.at[jnp.arange(ns), src_idx].set(1.0)
            frontier = paths
            level = jnp.where(paths > 0, jnp.int32(0),
                              jnp.int32(-1))  # -1 = unreached

            def fcond(carry):
                paths, frontier, level, d = carry
                return jnp.logical_and(jnp.any(frontier > 0), d < n)

            def fbody(carry):
                paths, frontier, level, d = carry
                nxt = spmv_batch(plan_t, frontier)
                nxt = jnp.where(paths > 0, 0.0, jnp.maximum(nxt, 0.0))
                paths = paths + nxt
                level = jnp.where(nxt > 0, d + 1, level)
                return paths, nxt, level, d + 1

            paths, _, level, depth = jax.lax.while_loop(
                fcond, fbody, (paths, frontier, level, jnp.int32(0)))

            bcm = jnp.ones((ns, n), jnp.float32)
            safe_paths = jnp.where(paths > 0, paths, 1.0)

            def bbody(k, bcm):
                i = depth - 1 - k
                w = jnp.where(level == i, bcm / safe_paths, 0.0)
                w2 = spmv_batch(plan_f, w)
                w2 = jnp.where(level == i - 1, jnp.maximum(w2, 0.0), 0.0)
                return bcm + w2 * paths

            # pairs (level i -> i-1) for i = depth-1 .. 2: the reference
            # sweep never accumulates into the level-0 sources
            # (gap/bcmark.py:52-60)
            bcm = jax.lax.fori_loop(0, jnp.maximum(depth - 2, 0), bbody,
                                    bcm)
            return jnp.sum(bcm, axis=0) - np.float32(ns)

        A._ell_c[key] = loop
    cent = A._ell_c[key](plan_t, plan_f,
                         jnp.asarray(np.asarray(sources, np.int32)))
    out = Vector.sparse(types.FP32, n)
    out._set_dense(cent, jnp.ones((n,), jnp.bool_))
    return out


# ---------------------------------------------------------------------------
# Device-resident frontier BFS (fused SpMSpV push direction)
# ---------------------------------------------------------------------------

def _frontier_csr(A):
    """Device dense-indptr CSR (indptr int32 (n+1), indices int32 (nnz))
    over the out-edges, cached on the matrix (frontier engine)."""
    if A._ell_c is None:
        A._ell_c = {}
    key = "frontier_csr"
    if key not in A._ell_c:
        u, s, d, outs, _ = A._host_csr(in_is_col=False)
        n = A.nrows
        degs = np.zeros(n + 1, np.int64)
        degs[u + 1] = d
        indptr = np.cumsum(degs)
        A._ell_c[key] = (jnp.asarray(indptr.astype(np.int32)),
                         jnp.asarray(outs.astype(np.int32)))
    return A._ell_c[key]


@partial(jax.jit, static_argnames=("n", "nnz_len", "p_bits", "e_tiers"))
def _bfs_frontier_loop(indptr, indices, n, nnz_len, start, p_bits,
                       e_tiers):
    """Whole-BFS executable with the frontier as an id buffer: per level
    the frontier's edge lists are expanded, deduplicated and compacted
    entirely on device — O(frontier edges) work per level, not O(n) or
    O(nnz) (VERDICT r2 weak #6; SURVEY §2.3 merge-based SpMSpV).

    Static budgets: the frontier id buffer holds 2**p_bits ids; per
    level the edge expansion runs in the smallest e_tiers bucket that
    fits (``lax.switch``), so quiet levels of high-diameter graphs pay
    small-array costs.  Exceeding every bucket (or the id buffer) sets
    the overflow flag and the wrapper re-plans with bigger budgets.
    """
    P = 1 << p_bits
    ths = jnp.asarray([1 << eb for eb in e_tiers], jnp.int32)

    visited0 = jnp.zeros((n,), jnp.bool_).at[start].set(True)
    levels0 = jnp.zeros((n,), jnp.int32).at[start].set(1)
    owner0 = jnp.zeros((n,), jnp.int32)
    fids0 = jnp.zeros((P,), jnp.int32).at[0].set(start)

    def cond(c):
        _, _, _, _, fcnt, level, ovf = c
        return (fcnt > 0) & jnp.logical_not(ovf) & (level <= n)

    def body(c):
        visited, levels, owner, fids, fcnt, level, ovf = c
        slot = jnp.arange(P, dtype=jnp.int32)
        act = slot < fcnt
        fi = jnp.where(act, fids, 0)
        deg = jnp.where(act, indptr[fi + 1] - indptr[fi], 0)
        cum = jnp.cumsum(deg)
        total = cum[P - 1]
        rs = cum - deg                       # run start of each slot
        adj = indptr[fi] - rs                # slot's base - its start

        def make_tier(eb):
            E = 1 << eb

            def tier(_):
                rs_ok = deg > 0
                mk = jnp.zeros((E,), jnp.int32).at[
                    jnp.where(rs_ok, rs, E)].max(slot + 1, mode="drop")
                ent = jax.lax.cummax(mk) - 1     # slot index per edge
                ar = jnp.arange(E, dtype=jnp.int32)
                valid = ar < total
                off = adj[jnp.maximum(ent, 0)] + ar
                dst = indices[jnp.clip(off, 0, nnz_len - 1)]
                dstc = jnp.where(valid, dst, 0)
                unvis = valid & jnp.logical_not(visited[dstc])
                own2 = owner.at[jnp.where(unvis, dstc, n)].set(
                    ar, mode="drop")
                win = unvis & (own2[dstc] == ar)
                pos = jnp.cumsum(win.astype(jnp.int32))
                ncnt = pos[E - 1]
                sel = jnp.where(win, dstc, n)
                vis2 = visited.at[sel].set(True, mode="drop")
                lv2 = levels.at[sel].set(level + 1, mode="drop")
                tgt = jnp.where(win & (pos - 1 < P), pos - 1, P)
                fn = jnp.zeros((P,), jnp.int32).at[tgt].set(
                    dstc, mode="drop")
                return vis2, lv2, own2, fn, ncnt, ncnt > P
            return tier

        branches = [make_tier(eb) for eb in e_tiers]
        branches.append(lambda _: (visited, levels, owner, fids,
                                   jnp.int32(0), jnp.bool_(True)))
        tix = jnp.sum((total > ths).astype(jnp.int32))
        vis2, lv2, own2, fn, ncnt, o2 = jax.lax.switch(tix, branches, 0)
        return vis2, lv2, own2, fn, ncnt, level + 1, ovf | o2

    _, levels, _, _, _, _, ovf = jax.lax.while_loop(
        cond, body, (visited0, levels0, owner0, fids0, jnp.int32(1),
                     jnp.int32(1), jnp.bool_(False)))
    return levels, ovf


def bfs_frontier(A, start, p_bits=None):
    """Device-resident frontier BFS: the whole level loop is ONE compiled
    executable with O(frontier edges) per-level device work — the push
    half of direction optimization, for high-diameter graphs (road
    networks) where the dense ``bfs_level`` does O(nnz) per level.

    Returns an INT64 Vector of 1-based levels (unreached absent).
    Budget overflow (giant frontiers — kron-type graphs) retries once
    with 4x budgets, then falls back to the dense fused loop.
    """
    n = A.nrows
    if n >= 2**31 or A.nvals >= 2**31 or A.nvals == 0:
        from . import algorithms

        return algorithms.bfs_level(A, start)
    indptr, indices = _frontier_csr(A)
    nnz_len = int(indices.shape[0])
    if p_bits is None:
        p_bits = max(12, int(np.ceil(np.log2(4.0 * np.sqrt(n)))))
    for _ in range(2):
        p_bits = min(p_bits, max(int(np.ceil(np.log2(n))), 4))
        e_tiers = tuple(min(eb, max(int(np.ceil(np.log2(nnz_len))), 6))
                        for eb in (p_bits, p_bits + 2, p_bits + 4))
        e_tiers = tuple(dict.fromkeys(e_tiers))  # dedup, keep order
        lv, ovf = _bfs_frontier_loop(indptr, indices, n, nnz_len,
                                     jnp.int32(start), p_bits, e_tiers)
        if not bool(ovf):
            break
        p_bits += 2
    else:
        return bfs_level(A, start)
    lv = lv.astype(jnp.int64)
    out = Vector.sparse(types.INT64, n)
    out._set_dense(lv, lv > 0)
    return out


# ---------------------------------------------------------------------------
# GraphChallenge sparse DNN inference, fused dense (reference
# demo/dnn/dnn.py:14-25)
# ---------------------------------------------------------------------------

@jax.jit
def _dnn_loop(wstack, bvec, y0, clip):
    """Y <- min(max(Y @ W_l + b_l, 0), clip) over all layers, one XLA
    program.  Adding the (negative) bias to absent (zero) cells and
    clipping at 0 reproduces the sparse recurrence exactly: products are
    nonnegative, so a cell survives iff a genuine product exceeded
    -bias -- identical to bias-on-pattern + ReLU + drop."""

    def body(l, y):
        t = jnp.matmul(y, wstack[l], preferred_element_type=jnp.float32)
        return jnp.clip(t + bvec[l], 0.0, clip)

    return jax.lax.fori_loop(0, wstack.shape[0], body, y0)


def dnn(W, B, Y, clip=32.0):
    """Fused GraphChallenge DNN inference (reference demo/dnn/dnn.py:14).

    TPU-first design: at the challenge's layer densities the MXU beats
    any sparse pipeline by orders of magnitude, so the whole net runs as
    one jit -- weights stacked (L, n, n) dense on device, images dense
    (m, n), bias add + ReLU + clip fused into the matmul epilogue, zero
    per-layer dispatches.  Semantically identical to
    :func:`algorithms.dnn` for nonnegative weights/images (the
    challenge's domain); returns a dense-stored FP32 Matrix.
    """
    from .matrix import Matrix

    n = W[0].nrows
    m = Y.nrows
    L = len(W)

    def _dense_np(mat):
        if mat._is_huge:  # forced-COO container: densify from triples
            r, c, v = mat._coo()
            return jnp.zeros((mat.nrows, mat.ncols), jnp.float32).at[
                jnp.asarray(r), jnp.asarray(c)].set(
                    jnp.asarray(v.astype(np.float32)))
        v, mk = mat._dense_pair()
        return jnp.where(mk, v, jnp.zeros((), v.dtype)).astype(jnp.float32)

    ws = jnp.stack([_dense_np(w) for w in W])
    bv = []
    for b in B:
        if isinstance(b, (int, float)):
            bv.append(float(b))
        else:  # bias-diagonal matrix (Matrix.identity(..., value=bias))
            _, _, dv = b._coo()
            bv.append(float(dv[0]) if len(dv) else 0.0)
    bvec = jnp.asarray(np.array(bv, np.float32))

    y0 = _dense_np(Y)

    yv = _dnn_loop(ws, bvec, y0, jnp.float32(clip))
    out = Matrix.sparse(types.FP32, m, n)
    if out._is_huge:
        ym = np.asarray(yv != 0)
        rr, cc = np.nonzero(ym)
        out._build(rr.astype(np.int64), cc.astype(np.int64),
                   np.asarray(yv)[rr, cc])
    else:
        out._set_dense(yv, yv != 0)
    return out
