"""Static permutation primitive: arbitrary N-element permutations at
vector speed on TPU via a Clos/Benes network decomposition.

Motivation (measured, see PERF.md): XLA lowers arbitrary gathers on this
TPU at ~8 cycles/element, but Mosaic's in-register lane gather
(``take_along_axis(..., axis=1)`` within a 128-lane row) runs at full
VPU speed (~210 Gelem/s), and large 2-D transposes run at HBM bandwidth.
Any *static* permutation can therefore be executed as a short fixed
sequence of lane-gather passes and transposes:

  level 0..D-1:  A_i  = per-row lane gather   (route to the "color" lane)
  middle:        S-way sublane select within (S, 128) tiles
  level D-1..0:  C_i  = per-row lane gather   (route to the final lane)

with a transpose between levels (the classic 3-stage Clos recursion:
rows x 128 lanes; the middle stage is 128 independent row-permutations,
recursed until rows <= 16).

Routing: stage lane assignments are an exact 128-edge-coloring of the
128-regular bipartite multigraph (src row -> dst row).  Level 0 (the
only cache-hostile, multi-million edge instance) is colored by a
vectorized numpy greedy-with-repair using embedding slack (rows are only
``fill``/128 full); levels >= 1 are completed to exactly 128-regular
with junk cells and colored exactly in native code
(`_fastio.benes_color`, Euler splits via a transition-system walk).

This has no counterpart in the reference (SuiteSparse does irregular
moves in C with random access); it is the TPU-native replacement for
every "scatter/permutation" on the sparse hot path: CSR<->CSC transpose
(reference: GrB_transpose, matrix.py:1059), SpMV product reordering, and
format conversion.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# Arbitrary-gather fallback threshold: below this size the XLA gather
# (8 cyc/elem) costs less than the fixed pass structure.
TRIVIAL_N = 1 << 14

_MAX_GREEDY_ROUNDS = 200


def _on_tpu():
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# host-side routing


def _greedy_color(src_row, dst_row, n_rows, rng):
    """Color N elements with colors 0..127, distinct within each src row
    and each dst row.  Rows are at most `fill` full (slack), so random
    greedy with per-round conflict repair converges geometrically.
    Vectorized numpy; returns uint8 colors."""
    n = len(src_row)
    # initial: distinct colors within each src row via per-row random ranks
    order = np.argsort(src_row * np.int64(256) +
                       rng.randint(0, 256, n).astype(np.int64), kind="stable")
    rank_in_src = np.empty(n, np.int64)
    first = np.zeros(n, bool)
    first[0] = True
    ssorted = src_row[order]
    first[1:] = ssorted[1:] != ssorted[:-1]
    run_id = np.cumsum(first) - 1
    run_start = np.flatnonzero(first)
    rank_in_src[order] = np.arange(n) - run_start[run_id]
    color = rank_in_src.astype(np.int64)  # distinct in src rows (fill <= 128)

    # src-row occupancy is an invariant: colors stay distinct per src row
    # throughout (losers only move to colors free in their src row, and
    # same-row pick collisions are rolled back).
    src_used = np.zeros((n_rows, 128), bool)
    src_used[src_row, color] = True
    dst_frozen = np.zeros((n_rows, 128), bool)
    live = np.arange(n)
    tbl = np.empty(n_rows * 128, np.int64)
    stall = 0
    prev = n + 1
    for _round in range(_MAX_GREEDY_ROUNDS):
        key = dst_row[live] * np.int64(128) + color[live]
        tbl[key] = live  # last writer among live claimants wins
        ok = np.logical_and(tbl[key] == live,
                            ~dst_frozen[dst_row[live], color[live]])
        dst_frozen[dst_row[live[ok]], color[live[ok]]] = True
        losers = live[~ok]
        if len(losers) == 0:
            live = losers
            break
        # plateau: hand the stubborn tail (high-multiplicity (src,dst)
        # pairs whose random picks keep colliding) to the exact
        # Kempe-chain augmenter instead of churning rounds
        stall = stall + 1 if len(losers) > 0.7 * prev else 0
        prev = len(losers)
        if stall >= 4 or len(losers) <= max(256, n // 2000):
            live = losers
            break
        # recolor: a random color free in the src row AND not frozen in the
        # dst row (the intersection palette — required for convergence)
        cand = ~np.logical_or(src_used[src_row[losers]],
                              dst_frozen[dst_row[losers]])
        # uniform-ish random candidate pick with one random per loser:
        # argmax of the rotated lane index over candidates
        rot = rng.randint(0, 128, len(losers)).astype(np.int32)
        lanes = np.arange(128, dtype=np.int32)
        score = cand * (((lanes[None, :] + rot[:, None]) & 127) + 1)
        newc = np.argmax(score, axis=1)
        movable = score[np.arange(len(losers)), newc] > 0
        # empty-palette losers just retry next round
        # roll back same-src-row pick collisions (keep one per (row,color))
        k2 = src_row[losers] * np.int64(128) + newc
        tbl[k2] = losers
        keep = np.logical_and(tbl[k2] == losers, movable)
        moved = losers[keep]
        src_used[src_row[moved], color[moved]] = False
        color[moved] = newc[keep]
        src_used[src_row[moved], color[moved]] = True
        live = losers
    if len(live):
        _augment_resolve(src_row, dst_row, color, live, src_used, dst_frozen,
                         n_rows)
    return color.astype(np.uint8)


def _augment_resolve(src_row, dst_row, color, leftovers, src_used,
                     dst_frozen, n_rows):
    """Exact Kempe-chain fallback for the greedy tail (usually empty).

    For a stuck element (free src colors and free dst colors disjoint):
    pick a free at src, b free at dst; swap colors a<->b along the
    ab-alternating chain through the already-frozen elements, which frees
    a at the dst row (standard bipartite edge-coloring augmentation)."""
    # element lookup tables per (row, color) on both sides; occupancy is
    # rebuilt from the placed (non-leftover) elements only — leftovers'
    # stale colors must not block or be released twice
    n = len(src_row)
    src_at = np.full((n_rows, 128), -1, np.int64)
    dst_at = np.full((n_rows, 128), -1, np.int64)
    frozen = np.ones(n, bool)
    frozen[leftovers] = False
    idx = np.flatnonzero(frozen)
    src_at[src_row[idx], color[idx]] = idx
    dst_at[dst_row[idx], color[idx]] = idx
    src_used[:] = False
    src_used[src_row[idx], color[idx]] = True
    dst_frozen[:] = False
    dst_frozen[dst_row[idx], color[idx]] = True

    def place(e, c):
        src_at[src_row[e], c] = e
        dst_at[dst_row[e], c] = e
        src_used[src_row[e], c] = True
        dst_frozen[dst_row[e], c] = True
        color[e] = c

    for e in leftovers:
        s, t = int(src_row[e]), int(dst_row[e])
        free_s = np.flatnonzero(~src_used[s])
        free_t = np.flatnonzero(~dst_frozen[t])
        both = np.intersect1d(free_s, free_t)
        if len(both):
            place(e, int(both[0]))
            continue
        a, b = int(free_s[0]), int(free_t[0])
        # flip colors a<->b along the ab-alternating chain from dst row t;
        # bipartiteness guarantees the chain never reaches src row s, so
        # after the flip `a` is free at both s and t.
        chain = [int(dst_at[t, a])]
        lookup_src = True  # alternate: src-side with b, dst-side with a
        while True:
            cur = chain[-1]
            nxt = int(src_at[src_row[cur], b]) if lookup_src \
                else int(dst_at[dst_row[cur], a])
            if nxt < 0:
                break
            chain.append(nxt)
            lookup_src = not lookup_src
        for el in chain:  # clear old entries first, then re-place
            c_old = int(color[el])
            src_at[src_row[el], c_old] = -1
            dst_at[dst_row[el], c_old] = -1
            src_used[src_row[el], c_old] = False
            dst_frozen[dst_row[el], c_old] = False
        for el in chain:
            place(el, a + b - int(color[el]))
        place(e, a)


def _exact_color(u, v, n_nodes):
    """Exact 128-coloring of a 128-regular bipartite multigraph via the
    native Euler-split routine; pure-python fallback for tiny inputs."""
    try:
        from pygraphblas_tpu import _fastio
        col = np.frombuffer(
            _fastio.benes_color(np.ascontiguousarray(u, np.int32).tobytes(),
                                np.ascontiguousarray(v, np.int32).tobytes(),
                                int(n_nodes), int(n_nodes), 7),
            np.uint8)
        return col.copy()
    except ImportError:  # pragma: no cover - test envs always build it
        return _exact_color_py(u, v, n_nodes)


def _exact_color_py(u, v, n_nodes):  # pragma: no cover
    """Reference implementation of recursive Euler-split coloring."""
    m = len(u)
    color = np.zeros(m, np.uint8)

    def rec(ids, bits, base):
        if bits == 0:
            color[ids] = base
            return
        # orient: pair incident edges per node, walk trails
        adj = {}
        for e in ids:
            adj.setdefault(("l", u[e]), []).append(e)
            adj.setdefault(("r", v[e]), []).append(e)
        slot = {}
        for k, es in adj.items():
            for i, e in enumerate(es):
                slot[(k, e) if (k, e) not in slot else (k, e, 1)] = i
        bit = {}
        seen = set()
        for e0 in ids:
            if e0 in seen:
                continue
            e, side = e0, 0
            while e not in seen:
                seen.add(e)
                bit[e] = side
                key = ("r", v[e]) if side == 0 else ("l", u[e])
                es = adj[key]
                s = es.index(e)
                ps = s ^ 1
                e = es[ps]
                side = 0 if key[0] == "l" else 1
        i0 = np.array([e for e in ids if bit[e] == 0], np.int64)
        i1 = np.array([e for e in ids if bit[e] == 1], np.int64)
        rec(i0, bits - 1, base)
        rec(i1, bits - 1, base + (1 << (bits - 1)))

    rec(np.arange(m, dtype=np.int64), 7, 0)
    return color


def _complete_level0(pp, qq, c0, R):
    """Extend the colored real elements to a full bijection on R*128
    cells: pair each (src row, free color) with a (dst row, free color)
    of the same color.  Returns full (p', q', color) arrays of length
    R*128."""
    n = len(pp)
    src_used = np.zeros(R * 128, bool)
    dst_used = np.zeros(R * 128, bool)
    src_cell_used = np.zeros(R * 128, bool)
    dst_cell_used = np.zeros(R * 128, bool)
    c64 = c0.astype(np.int64)
    src_used[(pp >> 7) * 128 + c64] = True
    dst_used[(qq >> 7) * 128 + c64] = True
    src_cell_used[pp] = True
    dst_cell_used[qq] = True

    # free (row, color) pairs, sorted by (color, row) so same-color pairs zip
    fs = np.flatnonzero(~src_used)     # row*128 + color
    fd = np.flatnonzero(~dst_used)
    fs = fs[np.argsort(fs & 127, kind="stable")]
    fd = fd[np.argsort(fd & 127, kind="stable")]
    # junk src/dst CELLS per row, in row order; assign row-by-row:
    # the i-th junk cell of row r pairs with the i-th free color of row r
    js = np.flatnonzero(~src_cell_used)   # cell index = row*128 + lane
    jd = np.flatnonzero(~dst_cell_used)
    # fs is (row*128+color) sorted by color; reorder junk cells to match:
    # sort fs by row to align with js (both per-row sequential), then the
    # color-sorted order defines the pairing with fd.
    fs_byrow = np.sort(fs)
    fd_byrow = np.sort(fd)
    # map: junk src cell js[i] gets color fs_byrow[i] & 127 (same row)
    assert len(js) == len(fs_byrow) and len(jd) == len(fd_byrow)
    # pair src and dst junk by color: order both sides by (color, row)
    so = np.argsort(fs_byrow & 127, kind="stable")
    do = np.argsort(fd_byrow & 127, kind="stable")
    jp = js[so]
    jq = jd[do]
    jc = (fs_byrow[so] & 127).astype(np.uint8)
    assert np.array_equal(jc, (fd_byrow[do] & 127).astype(np.uint8))

    p_full = np.concatenate([pp, jp])
    q_full = np.concatenate([qq, jq])
    c_full = np.concatenate([c0, jc])
    assert len(p_full) == R * 128
    return p_full, q_full, c_full, n


def _choose_shape(n, fill):
    """Pick (D, S, R0): N' = S * 128^D, R0 = N'/128, R0*fill >= n.

    S may run up to 128 (the bottom subproblems are (S,128) tiles; the
    sublane select handles any S): keeping D one level lower both avoids
    two whole permutation passes and keeps R0 close to n/128, so the
    K == 128 padding (core/xspmv.py) stays cheap — at S <= 16 a size
    just past a 16*128^(d-1) boundary would jump to 8x junk cells."""
    r_min = -(-n // fill)
    d = 1
    while 128 ** d < r_min:
        d += 1
    s = -(-r_min // (128 ** (d - 1)))
    assert 1 <= s <= 128
    r0 = s * 128 ** (d - 1)
    return d, s, r0


class PermPlan:
    """Compiled routing for one static permutation: out[q] = in[src[q]].

    Registered as a pytree so plans pass through jit as device-buffer
    arguments (stage arrays total hundreds of MB at GAP scale)."""

    __slots__ = ("n", "trivial", "src_idx", "D", "S", "R0", "K",
                 "a_stages", "c_stages", "ssel")

    def __init__(self):
        pass

    def _aux(self):
        return (self.n, self.trivial, self.D, self.S, self.R0, self.K,
                self.ssel is None, self.src_idx is None,
                len(self.a_stages) if not self.trivial else 0)

    def _children(self):
        if self.trivial:
            return (self.src_idx,)
        return tuple(self.a_stages) + tuple(self.c_stages) + \
            ((self.ssel,) if self.ssel is not None else ())

    @staticmethod
    def _unflatten(aux, children):
        p = PermPlan()
        (p.n, p.trivial, p.D, p.S, p.R0, p.K, no_ssel, no_src, nst) = aux
        if p.trivial:
            (p.src_idx,) = children
            p.a_stages = p.c_stages = []
            p.ssel = None
            return p
        p.src_idx = None
        p.a_stages = list(children[:nst])
        p.c_stages = list(children[nst:2 * nst])
        p.ssel = None if no_ssel else children[2 * nst]
        return p

    @staticmethod
    def build(src, fill=None, seed=0):
        """src: int array (N,), a permutation of 0..N-1.  out[q] = in[src[q]].

        fill: embedding occupancy per 128-lane row.  With the native
        exact colorer, 128 (no junk cells: 12% less traffic per pass and
        K == 128 enables the fold8-fused ascend).  The greedy fallback
        colorer needs slack (112)."""
        from ..io.native import HAVE_NATIVE

        if fill is None:
            fill = 128 if HAVE_NATIVE else 112
        src = np.asarray(src, np.int64)
        n = len(src)
        plan = PermPlan()
        plan.n = n
        if n <= TRIVIAL_N:
            plan.trivial = True
            plan.src_idx = jnp.asarray(src.astype(np.int32))
            plan.D = plan.S = plan.R0 = plan.K = 0
            plan.a_stages = plan.c_stages = []
            plan.ssel = None
            return plan
        plan.trivial = False
        plan.src_idx = None

        rng = np.random.RandomState(seed)
        D, S, R0 = _choose_shape(n, fill)
        K = min(128, -(-n // R0))  # lanes actually used per row
        plan.D, plan.S, plan.R0, plan.K = D, S, R0, K

        from ..io.native import HAVE_NATIVE

        if HAVE_NATIVE and K == 128:
            # whole-plan native assembly: the K==128 embedding is the
            # identity, and every per-level coloring + stage table fill
            # runs in one C call (the numpy assembly was host-bound at
            # GAP scale — PERF.md round 3)
            from pygraphblas_tpu import _fastio

            Np = R0 * 128
            blob = np.frombuffer(
                _fastio.benes_stages(
                    np.ascontiguousarray(src, np.int64).tobytes(),
                    int(n), int(D), int(S), int(R0)), np.int8)
            a_flat = blob[:D * Np].reshape(D, R0, 128)
            c_flat = blob[D * Np:2 * D * Np].reshape(D, R0, 128)
            plan.a_stages = [jnp.asarray(a_flat[l]) for l in range(D)]
            plan.c_stages = [jnp.asarray(c_flat[l]) for l in range(D)]
            if S > 1:
                nsub = 128 ** (D - 1)
                plan.ssel = jnp.asarray(
                    blob[2 * D * Np:].reshape(nsub, S, 128))
            else:
                plan.ssel = None
            return plan

        # embedding: element i of the in-array at cell (i//K)*128 + i%K
        q = np.arange(n, dtype=np.int64)
        pp = (src // K) * 128 + src % K
        qq = (q // K) * 128 + q % K

        # level-0 coloring.  Fast path: complete the embedding to a full
        # bijection FIRST (any pairing of free src cells with free dst
        # cells makes every row exactly 128-regular), then one exact
        # native Euler-split coloring — ~10x faster than the greedy
        # random repair loop at GAP scale.  Greedy remains the fallback
        # when the native extension is absent.
        from ..io.native import HAVE_NATIVE

        if HAVE_NATIVE:
            src_cell_used = np.zeros(R0 * 128, bool)
            dst_cell_used = np.zeros(R0 * 128, bool)
            src_cell_used[pp] = True
            dst_cell_used[qq] = True
            js = np.flatnonzero(~src_cell_used)
            jd = np.flatnonzero(~dst_cell_used)
            p_full = np.concatenate([pp, js])
            q_full = np.concatenate([qq, jd])
            c_full = _exact_color(p_full >> 7, q_full >> 7, R0)
        else:
            c0 = _greedy_color(pp >> 7, qq >> 7, R0, rng)
            p_full, q_full, c_full, _ = _complete_level0(pp, qq, c0, R0)

        a_stages, c_stages = [], []
        u = p_full       # current src cell index at this level, in [0, R_i*128)
        v = q_full
        g = np.zeros(R0 * 128, np.int64)   # subproblem id
        for lvl in range(D):
            rows = R0 // 128 ** lvl  # cells per subproblem row dimension
            if lvl > 0:
                # exact coloring of 128-regular subproblems (batched)
                nodes = g * rows + (u >> 7)
                nodes_v = g * rows + (v >> 7)
                c_full = _exact_color(nodes, nodes_v, R0)
            c64 = c_full.astype(np.int64)
            # A_lvl[g*rows + u>>7, c] = u & 127 ; C_lvl[g*rows + v>>7, v&127] = c
            a = np.tile(np.arange(128, dtype=np.uint8), (R0, 1))
            c = a.copy()
            a[g * rows + (u >> 7), c64] = (u & 127).astype(np.uint8)
            c[g * rows + (v >> 7), (v & 127)] = c_full
            a_stages.append(a)
            c_stages.append(c)
            g = g * 128 + c64
            u = u >> 7
            v = v >> 7
        # bottom: u, v now in [0, S) per subproblem; sublane select
        nsub = 128 ** (D - 1)
        ssel = None
        if S > 1:
            ssel = np.zeros((nsub, S, 128), np.uint8)
            ssel[g >> 7, v, (g & 127)] = u.astype(np.uint8)
        plan.a_stages = [jnp.asarray(x.astype(np.int8)) for x in a_stages]
        plan.c_stages = [jnp.asarray(x.astype(np.int8)) for x in c_stages]
        plan.ssel = jnp.asarray(ssel.astype(np.int8)) if S > 1 else None
        return plan

    # -- execution ----------------------------------------------------------

    def apply(self, x, pad_value=0):
        """Apply the permutation to a 1-D device array of length <= n
        (missing tail elements read as `pad_value` — lets callers skip a
        separate pad/concat pass).  Jit-composable."""
        if self.trivial:
            if x.shape[0] < self.n:
                x = jnp.concatenate(
                    [x, jnp.full(self.n - x.shape[0], pad_value, x.dtype)])
            return jnp.take(x, self.src_idx)
        return _apply_staged(x, self.n, self.D, self.S, self.R0, self.K,
                             tuple(self.a_stages), tuple(self.c_stages),
                             self.ssel, pad_value)

    def apply_fold8(self, x, pad_value, fold):
        """Apply the permutation, then fold each consecutive 8-row block
        of the (n//128, 128) output lanewise: out[j] = fold over s of
        permuted[(8j+s)*128 : (8j+s+1)*128].

        When the plan's layout allows (K == 128 staged plan, n % 1024
        == 0), the fold is FUSED into the final ascend pass — the
        biggest intermediate (8x the folded size) is never written to
        HBM.  Returns (array of length n // 8, True) either way; the
        unfused fallback folds in XLA."""
        if (_FUSE_FOLD8 and not self.trivial and self.K == 128
                and self.D >= 2 and self.n % 1024 == 0):
            return _apply_staged(x, self.n, self.D, self.S, self.R0,
                                 self.K, tuple(self.a_stages),
                                 tuple(self.c_stages), self.ssel,
                                 pad_value, fold8=fold), True
        full = self.apply(x, pad_value=pad_value)
        nfull = full.shape[0]
        pad = -nfull % 1024
        if pad:
            full = jnp.concatenate(
                [full, jnp.full(pad, pad_value, full.dtype)])
        f3 = full.reshape(-1, 8, 128)
        out = f3[:, 0, :]
        for s in range(1, 8):
            out = fold(out, f3[:, s, :])
        return out.reshape(-1)[:(nfull + pad) // 8], True


jax.tree_util.register_pytree_node(
    PermPlan,
    lambda p: (p._children(), p._aux()),
    PermPlan._unflatten)


def _lane_gather(x2d, idx8):
    """out[r, l] = x2d[r, idx[r, l]] — pallas on TPU, XLA elsewhere.
    64-bit element types fall back to the XLA gather."""
    idx = idx8.astype(jnp.int32)
    if not _on_tpu() or x2d.dtype.itemsize > 4:
        return jnp.take_along_axis(x2d, idx, axis=1)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrows = x2d.shape[0]
    blk = 4096  # measured optimum (PERF.md): 0.20 ms/pass at 23M elements
    while nrows % blk:
        blk //= 2

    def kern(i_ref, x_ref, o_ref):
        # 32-bit trace: Mosaic cannot lower the 64-bit index vectors jnp
        # helpers emit under jax_enable_x64
        with jax.enable_x64(False):
            o_ref[:] = jnp.take_along_axis(
                x_ref[:], i_ref[:].astype(jnp.int32), axis=1)

    with jax.enable_x64(False):  # index maps must trace 32-bit
        return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        grid=(nrows // blk,),
        in_specs=[pl.BlockSpec((blk, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((blk, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(idx8, x2d)


import os as _os
_TILE_B = int(_os.environ.get("PYGB_PERM_TILE_B", "64"))


def _pick_tile_batch(rb):
    """Tile-batch per grid step: a divisor of rb that satisfies the TPU
    block rule for the (…, B, 128) output spec — B % 8 == 0 or B == rb.
    Returns None when no such batch exists (callers fall back to the
    unfused gather + XLA transpose).

    Larger batches amortize grid-step overhead and lengthen DMAs; VMEM
    per step is ~B*176KB (x tile + out tile + int8 idx), so B=64 uses
    ~11 MB of the 128 MB VMEM.  B=64 measured fastest on v5e (PERF.md
    round-4 notes); PYGB_PERM_TILE_B re-tunes."""
    for b in (_TILE_B, 32, 16, 8):
        if b and rb % b == 0:
            return b
    if rb <= 16:
        return rb          # whole-array block: exempt from the 8-rule
    return None


def _lane_gather_tdesc(x2d, idx8, g, r_l):
    """Fused descend pass: lane gather + per-group transpose.

    (g*r_l, 128) -> (g*128*(r_l//128), 128) in ONE kernel; the separate
    XLA transpose pass (a full HBM round trip per level) disappears
    (PERF.md round-2 roadmap item 1)."""
    rb = r_l // 128
    fusable = ((_FORCE_INTERPRET or
                (_on_tpu() and x2d.dtype.itemsize <= 4))
               and r_l % 128 == 0)
    # non-8-divisible tile counts (e.g. rb=124 in batched BC) are padded
    # up to the Mosaic (8,128) block rule and sliced after: <=6% pad
    # overhead beats the unfused gather+transpose fallback (VERDICT r4)
    rbp = rb
    if fusable and _pick_tile_batch(rb) is None:
        rbp = -(-rb // 8) * 8
    B = _pick_tile_batch(rbp) if fusable else None
    if B is None:
        y = _lane_gather(x2d, idx8)
        t = y.reshape(g, r_l, 128)
        t = jnp.swapaxes(t, 1, 2)
        return t.reshape(g * 128 * rb, 128)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x4 = x2d.reshape(g, rb, 128, 128)
    i4 = idx8.reshape(g, rb, 128, 128)
    if rbp != rb:
        padw = ((0, 0), (0, rbp - rb), (0, 0), (0, 0))
        x4 = jnp.pad(x4, padw)
        i4 = jnp.pad(i4, padw)

    def kern(i_ref, x_ref, o_ref):
        with jax.enable_x64(False):
            for b in range(B):
                xt = x_ref[0, b]
                it = i_ref[0, b].astype(jnp.int32)
                y = jnp.take_along_axis(xt, it, axis=1)
                o_ref[0, :, b, :] = _tp(y)

    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((g, 128, rbp, 128), x2d.dtype),
            grid=(g, rbp // B),
            in_specs=[pl.BlockSpec((1, B, 128, 128),
                                   lambda gi, bb: (gi, bb, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, B, 128, 128),
                                   lambda gi, bb: (gi, bb, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128, B, 128),
                                   lambda gi, bb: (gi, 0, bb, 0),
                                   memory_space=pltpu.VMEM),
            # B=64 double-buffered tiles need ~18MB; the default scoped
            # budget is 16MB
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 << 20),
            interpret=_FORCE_INTERPRET,
        )(i4, x4)
    if rbp != rb:
        out = out[:, :, :rb, :]
    return out.reshape(g * 128 * rb, 128)


def _lane_gather_tasc(x2d, idx8, g, r_l, fold8=None):
    """Fused ascend pass: per-group inverse transpose + lane gather.

    (g*128*(r_l//128), 128) -> (g*r_l, 128) in one kernel.  With fold8,
    each consecutive 8-row block of the result is additionally folded
    lanewise in-kernel -> (g*r_l//8, 128): the full-size result never
    touches HBM (xspmv level-0 reduction fusion)."""
    rb = r_l // 128
    fusable = ((_FORCE_INTERPRET or
                (_on_tpu() and x2d.dtype.itemsize <= 4))
               and r_l % 128 == 0)
    rbp = rb
    if fusable and _pick_tile_batch(rb) is None:
        rbp = -(-rb // 8) * 8  # pad to the (8,128) rule, slice after
    B = _pick_tile_batch(rbp) if fusable else None
    if B is None:
        t = x2d.reshape(g, 128, r_l)
        t = jnp.swapaxes(t, 1, 2)
        y = _lane_gather(t.reshape(g * r_l, 128), idx8)
        if fold8 is None:
            return y
        y3 = y.reshape(g * r_l // 8, 8, 128)
        out = y3[:, 0, :]
        for s in range(1, 8):
            out = fold8(out, y3[:, s, :])
        return out
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x4 = x2d.reshape(g, 128, rb, 128)
    i4 = idx8.reshape(g, rb, 128, 128)
    if rbp != rb:
        x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, rbp - rb), (0, 0)))
        i4 = jnp.pad(i4, ((0, 0), (0, rbp - rb), (0, 0), (0, 0)))
    folded = fold8 is not None

    def kern(i_ref, x_ref, o_ref):
        with jax.enable_x64(False):
            for b in range(B):
                xt = x_ref[0, :, b, :]
                it = i_ref[0, b].astype(jnp.int32)
                y = jnp.take_along_axis(_tp(xt), it, axis=1)
                if folded:
                    y3 = y.reshape(16, 8, 128)
                    r = y3[:, 0, :]
                    for s in range(1, 8):
                        r = fold8(r, y3[:, s, :])
                    o_ref[0, b] = r
                else:
                    o_ref[0, b] = y

    out_tile = 16 if folded else 128
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((g, rbp, out_tile, 128),
                                           x2d.dtype),
            grid=(g, rbp // B),
            in_specs=[pl.BlockSpec((1, B, 128, 128),
                                   lambda gi, bb: (gi, bb, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 128, B, 128),
                                   lambda gi, bb: (gi, 0, bb, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, B, out_tile, 128),
                                   lambda gi, bb: (gi, bb, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 << 20),
            interpret=_FORCE_INTERPRET,
        )(i4, x4)
    if rbp != rb:
        out = out[:, :rb]
    return out.reshape(g * r_l * out_tile // 128, 128)


_FORCE_INTERPRET = False  # tests: run the fused kernel via interpret mode

# Fusion tuning gates (A/B-able at runtime; PERF.md "Tuning env-var
# knobs").
# _FUSE_MID: run the innermost descend+mid+ascend as one VMEM-resident
# kernel.  _FUSE_FOLD8: fold 8-row blocks inside the final ascend pass.
import os as _os
_FUSE_MID = _os.environ.get("PYGB_PERM_FUSE_MID", "1") != "0"
_FUSE_FOLD8 = _os.environ.get("PYGB_PERM_FUSE_FOLD8", "1") != "0"
# in-kernel (128,128) tile transpose strategy: VPU shuffles (jnp .T) or
# MXU identity-matmul (dot_general contracting axis 0 against I).
_MXU_TPOSE = _os.environ.get("PYGB_PERM_MXU_TPOSE", "1") != "0"


def _tp(y):
    """Transpose a square lane tile inside a Pallas kernel."""
    if not _MXU_TPOSE:
        return y.T
    eye = jnp.eye(y.shape[0], dtype=y.dtype)
    return jax.lax.dot_general(y, eye, (((0,), (0,)), ((), ())),
                               preferred_element_type=y.dtype)


def _inner3(x2d, a_in, a_mid, ssel, c_mid, c_in, g, S):
    """Fused middle of the Benes network: innermost descend pass +
    (S,128)-tile mid pass + innermost ascend pass in ONE kernel.

    Per group the three passes are closed over an (S*128, 128) slab
    (S <= 16 by _choose_shape, so <= 1 MB fp32): keeping it VMEM-resident
    removes 2 of the 5 HBM round trips of a D=3 permutation.  x2d is the
    descend output of level D-3: (g*S*128, 128) grouped by g."""
    r_l = S * 128
    if _FORCE_INTERPRET:
        pass  # take the Pallas path below under interpret mode
    elif not _on_tpu() or x2d.dtype.itemsize > 4:
        cur = _lane_gather_tdesc(x2d, a_in, g, r_l)
        nsub = cur.shape[0] // S
        cur = _mid_pass(cur.reshape(nsub, S, 128), a_mid, ssel, c_mid,
                        S).reshape(nsub * S, 128)
        return _lane_gather_tasc(cur, c_in, g, r_l)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x3 = x2d.reshape(g, r_l, 128)
    ai = a_in.reshape(g, S, 128, 128)
    ci = c_in.reshape(g, S, 128, 128)
    am = a_mid.reshape(g, 128, S, 128)
    cm = c_mid.reshape(g, 128, S, 128)
    ss = ssel.reshape(g, 128, S, 128) if ssel is not None else am

    def kern(ai_ref, am_ref, ss_ref, cm_ref, ci_ref, x_ref, o_ref):
        with jax.enable_x64(False):
            X = x_ref[0].reshape(S, 128, 128)
            # descend: per-tile lane gather + transpose (rows (b,r') ->
            # (c1,b))
            zs = []
            for b in range(S):
                y = jnp.take_along_axis(
                    X[b], ai_ref[0, b].astype(jnp.int32), axis=1)
                zs.append(_tp(y))
            Z = jnp.stack(zs, axis=1)          # (128, S, 128)
            # mid: A gather + sublane select + C gather within (S,128)
            ami = am_ref[0].reshape(128 * S, 128).astype(jnp.int32)
            y = jnp.take_along_axis(Z.reshape(128 * S, 128), ami, axis=1)
            y = y.reshape(128, S, 128)
            if S > 1:
                si = ss_ref[0].astype(jnp.int32)
                acc = jnp.zeros_like(y)
                for s0 in range(S):
                    acc = jnp.where(si == s0, y[:, s0:s0 + 1, :], acc)
                y = acc
            cmi = cm_ref[0].reshape(128 * S, 128).astype(jnp.int32)
            M = jnp.take_along_axis(y.reshape(128 * S, 128), cmi, axis=1)
            M = M.reshape(128, S, 128)
            # ascend: inverse transpose + lane gather, rows back to (b,r')
            for b in range(S):
                o_ref[0, b] = jnp.take_along_axis(
                    _tp(M[:, b, :]), ci_ref[0, b].astype(jnp.int32), axis=1)

    specs4 = [pl.BlockSpec((1,) + a.shape[1:],
                           lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
              for a in (ai, am, ss, cm, ci)]
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((g, S, 128, 128), x2d.dtype),
            grid=(g,),
            in_specs=specs4 + [pl.BlockSpec((1, r_l, 128),
                                            lambda i: (i, 0, 0),
                                            memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, S, 128, 128),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=_FORCE_INTERPRET,
        )(ai, am, ss, cm, ci, x3)
    return out.reshape(g * r_l, 128)


def _mid_pass(x3d, a8, ssel8, c8, s):
    """Fused A_last + sublane-select + C_last within (S,128) tiles.
    x3d: (nsub, S, 128)."""
    a = a8.astype(jnp.int32).reshape(x3d.shape)
    c = c8.astype(jnp.int32).reshape(x3d.shape)
    if not _on_tpu() or x3d.dtype.itemsize > 4:
        y = jnp.take_along_axis(x3d, a, axis=2)
        if ssel8 is not None:
            y = jnp.take_along_axis(y, ssel8.astype(jnp.int32), axis=1)
        return jnp.take_along_axis(y, c, axis=2)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nsub = x3d.shape[0]
    blk = 1
    while blk * 2 * s * 128 * 4 <= (1 << 20) and nsub % (blk * 2) == 0:
        blk *= 2

    def kern(a_ref, s_ref, c_ref, x_ref, o_ref):
        # Mosaic lane gathers are 2-D only: flatten (B, S, 128)->(B*S, 128)
        with jax.enable_x64(False):
            x3 = x_ref[:]
            b = x3.shape[0]
            ai = a_ref[:].reshape(b * s, 128).astype(jnp.int32)
            y = jnp.take_along_axis(x3.reshape(b * s, 128), ai,
                                    axis=1).reshape(b, s, 128)
            if s > 1:
                si = s_ref[:].astype(jnp.int32)
                acc = jnp.zeros_like(y)
                for s0 in range(s):
                    acc = jnp.where(si == s0, y[:, s0:s0 + 1, :], acc)
                y = acc
            ci = c_ref[:].reshape(b * s, 128).astype(jnp.int32)
            o_ref[:] = jnp.take_along_axis(y.reshape(b * s, 128), ci,
                                           axis=1).reshape(b, s, 128)

    args = [a8.reshape(x3d.shape),
            ssel8 if ssel8 is not None else a8.reshape(x3d.shape),
            c8.reshape(x3d.shape), x3d]
    specs = [pl.BlockSpec((blk, s, 128), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM) for _ in args]
    with jax.enable_x64(False):  # index maps must trace 32-bit
        return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x3d.shape, x3d.dtype),
        grid=(nsub // blk,),
        in_specs=specs,
        out_specs=pl.BlockSpec((blk, s, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(*args)


def _apply_staged(x, n, D, S, R0, K, a_stages, c_stages, ssel,
                  pad_value=0, fold8=None):
    dtype = x.dtype
    # embed: element i -> cell (i//K)*128 + (i%K); tail elements beyond
    # the supplied x (and the embedding pad) read as pad_value
    pad_n = R0 * K - x.shape[0]
    xe = jnp.concatenate(
        [x, jnp.full((pad_n,), pad_value, dtype)]) if pad_n else x
    xe = xe.reshape(R0, K)
    if K < 128:
        xe = jnp.pad(xe, ((0, 0), (0, 128 - K)))
    # descend: A stages with the inter-level transposes fused into the
    # gather kernels (each fusion removes one full HBM round trip)
    cur = xe                      # (rows_total, 128) at each level
    shapes = []
    # fuse the innermost descend + mid + innermost ascend into one
    # VMEM-resident kernel when the layout allows (K == 128 plans with
    # D >= 3; the D == 2 middle would displace the fold8-fused ascend;
    # S <= 24 keeps the per-group slab + intermediates within VMEM)
    fuse_mid = _FUSE_MID and D >= 3 and K == 128 and S <= 24
    for lvl in range(D - 1):
        r_l = R0 // 128 ** lvl
        g_count = cur.shape[0] // r_l
        shapes.append((g_count, r_l))
        if fuse_mid and lvl == D - 2:
            break
        if r_l >= 128:
            cur = _lane_gather_tdesc(cur, a_stages[lvl], g_count, r_l)
        else:
            cur = _lane_gather(cur, a_stages[lvl])
            t = cur.reshape(g_count, r_l, 128)
            t = jnp.swapaxes(t, 1, 2)
            cur = t.reshape(g_count * 128, r_l)
    if fuse_mid:
        g_count, r_l = shapes[-1]          # r_l == 128 * S here
        cur = _inner3(cur, a_stages[D - 2], a_stages[D - 1], ssel,
                      c_stages[D - 1], c_stages[D - 2], g_count, S)
        start_asc = D - 3
    else:
        # bottom level: fused A + select + C within (S,128) tiles
        nsub = cur.shape[0] // S
        cur = _mid_pass(cur.reshape(nsub, S, 128), a_stages[D - 1], ssel,
                        c_stages[D - 1], S).reshape(nsub * S, 128)
        start_asc = D - 2
    # ascend: inverse transposes fused with the C gathers
    for lvl in range(start_asc, -1, -1):
        g_count, r_l = shapes[lvl]
        if r_l >= 128:
            # final pass: optionally fold consecutive 8-row blocks
            # in-kernel (K == 128 layouts only; callers guarantee it)
            f = fold8 if lvl == 0 else None
            cur = _lane_gather_tasc(cur, c_stages[lvl], g_count, r_l,
                                    fold8=f)
            if f is not None:
                return cur.reshape(-1)
        else:
            t = cur.reshape(g_count, 128, r_l)
            t = jnp.swapaxes(t, 1, 2)
            cur = _lane_gather(t.reshape(g_count * r_l, 128),
                               c_stages[lvl])
    # extract
    out = cur[:, :K].reshape(R0 * K)[:n]
    return out
