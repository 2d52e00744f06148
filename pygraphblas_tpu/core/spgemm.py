"""Masked sparse SpGEMM: C<M> = A (+.x) B over huge matrices.

With the mask known, SpGEMM reduces to one sparse dot product per mask
entry: c_ij = (+)_k a_ik (x) b_kj over k in rowA(i) ∩ colB(j).  The
TPU-friendly formulation is the *sorted-concat intersection*: for each
mask edge, concatenate the two sorted index lists and lane-sort them —
matches appear as adjacent duplicates, and the per-edge combine is a
dense axis-1 reduction.  Mask edges are bucketed by the padded width of
their combined lists so every bucket is one static-shape kernel.

This is the masked Gustavson/dot formulation of the design brief
(BASELINE.json config[2]: triangle counting as masked plus_pair SpGEMM),
with the lower-triangle ordering bounding the per-edge work.

Heavy edges whose combined lists exceed the width cap fall back to a
host-side sorted intersection (rare under degree ordering; counted and
reported via burble).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..base import burble
from .dense import _masked_tree_reduce

WIDTH_CAP = 32768


def _csr_of(rows, cols, vals):
    """rows sorted -> (unique rows, starts, degrees).  O(n) run-length
    scan — np.unique would re-sort the already-sorted rows."""
    n = len(rows)
    if n == 0:
        z = np.empty(0, np.int64)
        return z, z.copy(), z.copy()
    newr = np.empty(n, bool)
    newr[0] = True
    np.not_equal(rows[1:], rows[:-1], out=newr[1:])
    s = np.flatnonzero(newr)
    return rows[s], s, np.diff(np.append(s, n))


def _row_lookup(u, s, d, query):
    """(start, degree) per queried row id.  Dense O(1) tables when the
    id space is small; sorted search otherwise (no dense per-dimension
    arrays, so 2^60 logical dims cost O(nnz) only)."""
    if len(u) == 0:
        z = np.zeros(len(query), np.int64)
        return z, z.copy()
    hi = int(u[-1]) + 1
    if hi <= max(1 << 22, 4 * len(u)):
        st = np.zeros(hi + 1, np.int64)
        dg = np.zeros(hi + 1, np.int64)
        st[u] = s
        dg[u] = d
        q = np.minimum(query, hi)
        return st[q], dg[q]
    pos = np.searchsorted(u, query)
    pos_c = np.minimum(pos, len(u) - 1)
    found = (pos < len(u)) & (u[pos_c] == query)
    return (np.where(found, s[pos_c], 0).astype(np.int64),
            np.where(found, d[pos_c], 0).astype(np.int64))


def _pallas_fill_keys(a_cols2, b_cols2, a_st, wa, b_st, wb, width):
    """Side-tagged sorted-concat KEY build as a Pallas kernel.

    The XLA build costs ~8 cyc per padded element (arbitrary gather
    lowering); but each row's A/B segments are CONTIGUOUS slices of the
    column arrays, so dynamic sublane window loads + lane shifts fill a
    (8,128) tile in a handful of vector ops.  int32 keys; covers the
    payload-free (PAIR) path = triangle counting / k-truss."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e_pad = a_st.shape[0]
    nw = width // 128
    sent = np.int32(1 << 30)

    rows_a = a_cols2.shape[0]
    rows_b = b_cols2.shape[0]

    # rows per grid step: 8 rows/step costs ~2-3us of per-step overhead
    # each, which dominated the whole masked SpGEMM (r5 profile: 1.26s
    # of a 3.4s warm TC).  Batch up to 256 rows per step, bounded by a
    # 4MB out tile.
    R = 8
    for cand in (256, 128, 64, 32, 16):
        if e_pad % cand == 0 and cand * width * 4 <= (4 << 20):
            R = cand
            break

    def kern(ast_ref, wa_ref, bst_ref, wb_ref, a_ref, b_ref, o_ref):
        pid = pl.program_id(0).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def tile(t, _):
            base_e = (pid * (R // 8) + t) * 8

            def window(w, _):
                w = w.astype(jnp.int32)
                p0 = w * 128
                wa0_rows, wa1_rows, wb0_rows, wb1_rows = [], [], [], []
                sha_rows, shb_rows, war_rows, wbr_rows = [], [], [], []
                for r in range(8):
                    e = base_e + r
                    ast, war = ast_ref[e], wa_ref[e]
                    bst, wbr = bst_ref[e], wb_ref[e]
                    ba = ast + p0
                    # clamp the window base so qa+1 stays in bounds by
                    # construction (wide buckets advance p0 past the
                    # row segment; those lanes are masked out below)
                    qa = jax.lax.clamp(0, ba >> 7, rows_a - 2)
                    wa0_rows.append(a_ref[pl.ds(qa, 1), :])
                    wa1_rows.append(a_ref[pl.ds(qa + 1, 1), :])
                    sha_rows.append(ba - qa * 128)
                    # B is laid out REVERSED at the END of the row:
                    # lane p reads B element (width-1-p); the row
                    # becomes BITONIC (A asc | pads asc | B desc), so a
                    # log2(width) bitonic merge replaces the full lane
                    # sort downstream.
                    bb = bst + (width - 1 - p0 - 127)
                    qb = jax.lax.clamp(0, bb >> 7, rows_b - 2)
                    wb0_rows.append(b_ref[pl.ds(qb, 1), :])
                    wb1_rows.append(b_ref[pl.ds(qb + 1, 1), :])
                    shb_rows.append(bb - qb * 128)
                    war_rows.append(war)
                    wbr_rows.append(wbr)
                wa0 = jnp.concatenate(wa0_rows, axis=0)
                wa1 = jnp.concatenate(wa1_rows, axis=0)
                wb0 = jnp.concatenate(wb0_rows, axis=0)
                wb1 = jnp.concatenate(wb1_rows, axis=0)
                sha = jnp.stack(sha_rows).reshape(8, 1)
                shb = jnp.stack(shb_rows).reshape(8, 1)
                war = jnp.stack(war_rows).reshape(8, 1)
                wbr = jnp.stack(wbr_rows).reshape(8, 1)
                p = p0 + lane
                la = sha + lane
                ka = jnp.where(la < 128,
                               jnp.take_along_axis(wa0, la & 127, axis=1),
                               jnp.take_along_axis(wa1, la & 127, axis=1))
                # o = width-1-p decreases with lane: o & 127 = 127 -
                # lane + (shb base), covered by the same two-window
                # select
                lb = jax.lax.max(shb + (127 - lane), 0)
                kb = jnp.where(lb < 128,
                               jnp.take_along_axis(wb0, lb & 127, axis=1),
                               jnp.take_along_axis(wb1, lb & 127, axis=1))
                in_a = p < war
                in_b = p >= width - wbr
                o_ref[pl.ds(t * 8, 8), pl.ds(p0, 128)] = jnp.where(
                    in_a, ka * 2,
                    jnp.where(in_b, kb * 2 + 1, sent + 2 * p))
                return 0

            jax.lax.fori_loop(0, nw, window, 0)
            return 0

        with jax.enable_x64(False):
            jax.lax.fori_loop(0, R // 8, tile, 0)

    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((e_pad, width), jnp.int32),
            grid=(e_pad // R,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4 +
                     [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((R, width), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20),
        )(a_st, wa, b_st, wb, a_cols2, b_cols2)


def _pallas_fill_merge_count(a_cols2, b_cols2, a_st, wa, b_st, wb,
                             width):
    """Fully fused pair-intersect: fill the side-tagged bitonic
    (R, width) key layout into VMEM scratch (8-edge subtiles, slab
    loads), bitonic-merge it IN PLACE, and emit only the per-edge
    adjacent-match counts.

    The unfused chain (fill kernel -> XLA merge stages -> count)
    round-trips the (E, width) keys through HBM once per merge stage —
    6.2 GB * ~5 passes for kron-16 TC, ~1.2s of pure bandwidth.  Here
    the keys never leave VMEM and the merge/count phases run on
    (R, 128) slabs (R up to 128 edges) so per-op issue overhead is
    amortized 16x over the v1 8-row tiles (r5 bisect: 7 merge stages
    at (8,128) cost 537ns/tile, over half the kernel)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e_pad = a_st.shape[0]
    nw = width // 128
    sent = np.int32(1 << 30)
    rows_a = a_cols2.shape[0]
    rows_b = b_cols2.shape[0]

    # R edges per grid step: scratch (R, width) int32 capped at 2MB
    R = 8
    for cand in (128, 64, 32, 16):
        if e_pad % cand == 0 and cand * width * 4 <= (2 << 20):
            R = cand
            break

    GW = min(nw, 8)  # windows per slab group (unrolled)
    NG = nw // GW

    def kern(ast_ref, wa_ref, bst_ref, wb_ref, a_ref, b_ref, o_ref,
             scratch):
        pid = pl.program_id(0).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)

        # ---- phase A: slab fill, 8-edge subtiles ---------------------
        def tile(t, _):
            base_e = pid * R + t * 8
            ast8, war8, bst8, wbr8 = [], [], [], []
            for r in range(8):
                e = base_e + r
                ast8.append(ast_ref[e])
                war8.append(wa_ref[e])
                bst8.append(bst_ref[e])
                wbr8.append(wb_ref[e])
            war = jnp.stack(war8).reshape(8, 1)
            wbr = jnp.stack(wbr8).reshape(8, 1)
            sha = jnp.stack([a & 127 for a in ast8]).reshape(8, 1)
            shb = jnp.stack([b & 127 for b in bst8]).reshape(8, 1)
            idx_a = sha + lane            # in [0, 255)
            idx_b = shb + (127 - lane)    # in [0, 255)

            def group(g, _):
                g = g.astype(jnp.int32)
                la_rows, lb_rows = [], []
                for r in range(8):
                    qa = jax.lax.clamp(0, (ast8[r] >> 7) + g * GW,
                                       rows_a - (GW + 1))
                    la_rows.append(a_ref[pl.ds(qa, GW + 1), :])
                    qb = jax.lax.clamp(
                        0, (bst8[r] >> 7) + (NG - 1 - g) * GW,
                        rows_b - (GW + 1))
                    lb_rows.append(b_ref[pl.ds(qb, GW + 1), :])
                for wl in range(GW):
                    # A uses slab rows (wl, wl+1); B is reversed: local
                    # window w = g*GW+wl reads global B rows
                    # (nw-w-1, nw-w) = slab rows (GW-wl-1, GW-wl).
                    # Mosaic gathers need idx.shape == operand.shape,
                    # so gather each 128-lane half and select.
                    a_lo = jnp.concatenate(
                        [la_rows[r][wl:wl + 1, :] for r in range(8)],
                        axis=0)
                    a_hi = jnp.concatenate(
                        [la_rows[r][wl + 1:wl + 2, :] for r in range(8)],
                        axis=0)
                    bl = GW - wl - 1
                    b_lo = jnp.concatenate(
                        [lb_rows[r][bl:bl + 1, :] for r in range(8)],
                        axis=0)
                    b_hi = jnp.concatenate(
                        [lb_rows[r][bl + 1:bl + 2, :] for r in range(8)],
                        axis=0)
                    ia = idx_a & 127
                    ka = jnp.where(
                        idx_a < 128,
                        jnp.take_along_axis(a_lo, ia, axis=1),
                        jnp.take_along_axis(a_hi, ia, axis=1))
                    ib = idx_b & 127
                    kb = jnp.where(
                        idx_b < 128,
                        jnp.take_along_axis(b_lo, ib, axis=1),
                        jnp.take_along_axis(b_hi, ib, axis=1))
                    p = (g * GW + wl) * 128 + lane
                    in_a = p < war
                    in_b = p >= width - wbr
                    scratch[pl.ds(t * 8, 8),
                            pl.ds((g * GW + wl) * 128, 128)] = \
                        jnp.where(in_a, ka * 2,
                                  jnp.where(in_b, kb * 2 + 1,
                                            sent + 2 * p))
                return 0

            jax.lax.fori_loop(0, NG, group, 0)
            return 0

        with jax.enable_x64(False):
            jax.lax.fori_loop(0, R // 8, tile, 0)

            # ---- phase B: inter-block bitonic-merge stages (s >= 128)
            # on full (R, 128) slabs: compare-exchange lane-aligned
            # blocks b and b^sblk ------------------------------------
            sblk = nw // 2
            while sblk >= 1:
                m = sblk - 1

                def pair(pi, _):
                    pi = pi.astype(jnp.int32)
                    b = ((pi & ~m) << 1) | (pi & m)
                    x = scratch[:, pl.ds(b * 128, 128)]
                    y = scratch[:, pl.ds((b | sblk) * 128, 128)]
                    scratch[:, pl.ds(b * 128, 128)] = jnp.minimum(x, y)
                    scratch[:, pl.ds((b | sblk) * 128, 128)] = \
                        jnp.maximum(x, y)
                    return 0

                jax.lax.fori_loop(0, nw // 2, pair, 0)
                sblk //= 2

            # ---- phase C: per-block sort + match count on (R, 128)
            # slabs.  XOR-shuffle stages via STATIC rolls + select:
            # partner(lane) = lane^s is roll(-s) on lanes with bit s
            # clear and roll(+s) on those with it set (no wrap crosses
            # the selection) — no dynamic lane gather ----------------
            def block(b, carry):
                cnt, prev_last = carry
                x = scratch[:, pl.ds(b * 128, 128)]
                for s in (64, 32, 16, 8, 4, 2, 1):
                    fwd = jnp.concatenate([x[:, s:], x[:, :s]], axis=1)
                    bwd = jnp.concatenate([x[:, -s:], x[:, :-s]],
                                          axis=1)
                    y = jnp.where((lane_r & s) == 0, fwd, bwd)
                    x = jnp.where((lane_r & s) == 0, jnp.minimum(x, y),
                                  jnp.maximum(x, y))
                match = (x[:, :-1] >> 1) == (x[:, 1:] >> 1)
                cnt = cnt + jnp.sum(
                    match.astype(jnp.int32), axis=1, keepdims=True)
                cnt = cnt + ((prev_last >> 1) == (x[:, :1] >> 1)
                             ).astype(jnp.int32)
                return cnt, x[:, -1:]

            cnt0 = jnp.zeros((R, 1), jnp.int32)
            prev0 = jnp.full((R, 1), -1, jnp.int32)
            cnt, _ = jax.lax.fori_loop(0, nw, block, (cnt0, prev0))
            o_ref[:, :] = cnt

    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((e_pad, 1), jnp.int32),
            grid=(e_pad // R,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4 +
                     [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((R, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((R, width), jnp.int32)],
            # 2x24MB resident operands + scratch exceed the default
            # 16MB scoped budget
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20),
        )(a_st, wa, b_st, wb, a_cols2, b_cols2)
    return out[:, 0]


def _bitonic_merge(x):
    """Sort a batch of BITONIC lanes ascending: log2(W) compare-exchange
    stages instead of the ~log^2(W)/2 of a full sort — the fill kernel
    lays each row out ascending-then-descending exactly to enable
    this."""
    E, W = x.shape
    s = W // 2
    while s >= 1:
        x4 = x.reshape(E, W // (2 * s), 2, s)
        lo = jnp.minimum(x4[:, :, 0, :], x4[:, :, 1, :])
        hi = jnp.maximum(x4[:, :, 0, :], x4[:, :, 1, :])
        x = jnp.stack([lo, hi], axis=2).reshape(E, W)
        s //= 2
    return x


def _fill_sort_count_body(a_cols2, b_cols2, a_st, wa, b_st, wb,
                          out_dtype, width):
    """Payload-free intersect: Pallas key fill + bitonic merge +
    adjacent-match count (PAIR mul)."""
    out_dtype = np.dtype(out_dtype)
    keys = _pallas_fill_keys(a_cols2, b_cols2, a_st, wa, b_st, wb, width)
    # merge up to moderate widths: beyond that the unrolled stage chain
    # costs more XLA compile time than the rare wide bucket saves
    ks = _bitonic_merge(keys) if width <= 4096 \
        else jax.lax.sort(keys, dimension=1)
    match = (ks[:, :-1] >> 1) == (ks[:, 1:] >> 1)
    c = jnp.sum(match.astype(out_dtype), axis=1)
    cnt = jnp.sum(match.astype(jnp.int32), axis=1)
    return c, cnt


def _pallas_fill_merge_fold(a_cols2, a_vals2, b_cols2, b_vals2, a_st,
                            wa, b_st, wb, width, mulf, addf, ident,
                            vdtype):
    """VALUED fused pair-intersect: like `_pallas_fill_merge_count` but
    each key carries its operand value through the bitonic merge
    (compare-exchange selects applied to both), products mul(va, vb)
    form at adjacent matches, and a log-roll fold with the add monoid
    reduces each edge IN KERNEL.  Extends the fused path to every
    builtin/user semiring over 4-byte types — general masked products
    previously took the XLA-gather generic buckets (ESC roadmap:
    'value payloads')."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e_pad = a_st.shape[0]
    nw = width // 128
    sent = np.int32(1 << 30)
    rows_a = a_cols2.shape[0]
    rows_b = b_cols2.shape[0]
    vdt = jnp.dtype(vdtype)

    R = 8
    for cand in (128, 64, 32, 16):
        if e_pad % cand == 0 and cand * width * 8 <= (2 << 20):
            R = cand
            break

    GW = min(nw, 8)
    NG = nw // GW

    def kern(ast_ref, wa_ref, bst_ref, wb_ref, ak_ref, av_ref, bk_ref,
             bv_ref, oc_ref, ov_ref, sk, sv):
        pid = pl.program_id(0).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)

        def tile(t, _):
            base_e = pid * R + t * 8
            ast8, war8, bst8, wbr8 = [], [], [], []
            for r in range(8):
                e = base_e + r
                ast8.append(ast_ref[e])
                war8.append(wa_ref[e])
                bst8.append(bst_ref[e])
                wbr8.append(wb_ref[e])
            war = jnp.stack(war8).reshape(8, 1)
            wbr = jnp.stack(wbr8).reshape(8, 1)
            sha = jnp.stack([a & 127 for a in ast8]).reshape(8, 1)
            shb = jnp.stack([b & 127 for b in bst8]).reshape(8, 1)
            idx_a = sha + lane
            idx_b = shb + (127 - lane)

            def group(g, _):
                g = g.astype(jnp.int32)
                lak, lav, lbk, lbv = [], [], [], []
                for r in range(8):
                    qa = jax.lax.clamp(0, (ast8[r] >> 7) + g * GW,
                                       rows_a - (GW + 1))
                    lak.append(ak_ref[pl.ds(qa, GW + 1), :])
                    lav.append(av_ref[pl.ds(qa, GW + 1), :])
                    qb = jax.lax.clamp(
                        0, (bst8[r] >> 7) + (NG - 1 - g) * GW,
                        rows_b - (GW + 1))
                    lbk.append(bk_ref[pl.ds(qb, GW + 1), :])
                    lbv.append(bv_ref[pl.ds(qb, GW + 1), :])

                def pick(slabs, lo_row, idx):
                    lo = jnp.concatenate(
                        [slabs[r][lo_row:lo_row + 1, :]
                         for r in range(8)], axis=0)
                    hi = jnp.concatenate(
                        [slabs[r][lo_row + 1:lo_row + 2, :]
                         for r in range(8)], axis=0)
                    i = idx & 127
                    return jnp.where(
                        idx < 128,
                        jnp.take_along_axis(lo, i, axis=1),
                        jnp.take_along_axis(hi, i, axis=1))

                for wl in range(GW):
                    bl = GW - wl - 1
                    ka = pick(lak, wl, idx_a)
                    va = pick(lav, wl, idx_a)
                    kb = pick(lbk, bl, idx_b)
                    vb = pick(lbv, bl, idx_b)
                    p = (g * GW + wl) * 128 + lane
                    in_a = p < war
                    in_b = p >= width - wbr
                    sk[pl.ds(t * 8, 8),
                       pl.ds((g * GW + wl) * 128, 128)] = jnp.where(
                        in_a, ka * 2,
                        jnp.where(in_b, kb * 2 + 1, sent + 2 * p))
                    sv[pl.ds(t * 8, 8),
                       pl.ds((g * GW + wl) * 128, 128)] = jnp.where(
                        in_a, va, jnp.where(in_b, vb,
                                            jnp.asarray(ident, vdt)))
                return 0

            jax.lax.fori_loop(0, NG, group, 0)
            return 0

        with jax.enable_x64(False):
            jax.lax.fori_loop(0, R // 8, tile, 0)

            # phase B: inter-block compare-exchange, values follow keys
            sblk = nw // 2
            while sblk >= 1:
                m = sblk - 1

                def pair(pi, _):
                    pi = pi.astype(jnp.int32)
                    b = ((pi & ~m) << 1) | (pi & m)
                    kx = sk[:, pl.ds(b * 128, 128)]
                    ky = sk[:, pl.ds((b | sblk) * 128, 128)]
                    vx = sv[:, pl.ds(b * 128, 128)]
                    vy = sv[:, pl.ds((b | sblk) * 128, 128)]
                    lo = kx <= ky
                    sk[:, pl.ds(b * 128, 128)] = jnp.where(lo, kx, ky)
                    sv[:, pl.ds(b * 128, 128)] = jnp.where(lo, vx, vy)
                    sk[:, pl.ds((b | sblk) * 128, 128)] = \
                        jnp.where(lo, ky, kx)
                    sv[:, pl.ds((b | sblk) * 128, 128)] = \
                        jnp.where(lo, vy, vx)
                    return 0

                jax.lax.fori_loop(0, nw // 2, pair, 0)
                sblk //= 2

            # phase C: per-block XOR-roll sort (keys unique, values
            # carried by the same selects), match products, monoid fold
            def roll(x, s):
                return jnp.concatenate([x[:, s:], x[:, :s]], axis=1)

            def rollb(x, s):
                return jnp.concatenate([x[:, -s:], x[:, :-s]], axis=1)

            def block(b, carry):
                cnt, acc, pk, pv = carry
                k = sk[:, pl.ds(b * 128, 128)]
                v = sv[:, pl.ds(b * 128, 128)]
                for s in (64, 32, 16, 8, 4, 2, 1):
                    bit0 = (lane_r & s) == 0
                    kp = jnp.where(bit0, roll(k, s), rollb(k, s))
                    vp = jnp.where(bit0, roll(v, s), rollb(v, s))
                    # keys are unique, so "partner wins" is (kp<k) on
                    # bit-clear lanes and its negation on bit-set ones;
                    # == avoids a bool-vector select (Mosaic can't
                    # truncate i8->i1)
                    take = (kp < k) == bit0
                    k = jnp.where(take, kp, k)
                    v = jnp.where(take, vp, v)
                # adjacent matches incl. previous block's last element
                kprev = jnp.concatenate([pk, k[:, :-1]], axis=1)
                vprev = jnp.concatenate([pv, v[:, :-1]], axis=1)
                match = (kprev >> 1) == (k >> 1)
                prod = jnp.where(match, mulf(vprev, v),
                                 jnp.asarray(ident, vdt))
                cnt = cnt + jnp.sum(match.astype(jnp.int32), axis=1,
                                    keepdims=True)
                # log-roll fold of the 128 products with the monoid
                x = prod
                for s in (64, 32, 16, 8, 4, 2, 1):
                    shifted = jnp.where(
                        lane_r < 128 - s, roll(x, s),
                        jnp.asarray(ident, vdt))
                    x = addf(x, shifted)
                acc = addf(acc, x[:, :1])
                return cnt, acc, k[:, -1:], v[:, -1:]

            cnt0 = jnp.zeros((R, 1), jnp.int32)
            acc0 = jnp.full((R, 1), ident, vdt)
            pk0 = jnp.full((R, 1), -1, jnp.int32)
            pv0 = jnp.full((R, 1), ident, vdt)
            cnt, acc, _, _ = jax.lax.fori_loop(
                0, nw, block, (cnt0, acc0, pk0, pv0))
            oc_ref[:, :] = cnt
            ov_ref[:, :] = acc

    with jax.enable_x64(False):
        cnt, vals = pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((e_pad, 1), jnp.int32),
                       jax.ShapeDtypeStruct((e_pad, 1), vdt)),
            grid=(e_pad // R,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4 +
                     [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=(pl.BlockSpec((R, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((R, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)),
            scratch_shapes=[pltpu.VMEM((R, width), jnp.int32),
                            pltpu.VMEM((R, width), vdt)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20),
        )(a_st, wa, b_st, wb, a_cols2, a_vals2, b_cols2, b_vals2)
    return cnt[:, 0], vals[:, 0]


@partial(jax.jit, static_argnames=("semiring", "vdtype", "width",
                                   "step", "nchunks"))
def _fill_fold_bucket(a_cols2, a_vals2, b_cols2, b_vals2, a_st, wa,
                      b_st, wb, semiring, vdtype, width, step, nchunks):
    """One width bucket of the VALUED fused path: lax.scan over chunks
    of `_pallas_fill_merge_fold`."""
    vdt = np.dtype(vdtype)
    mulf = semiring.mul_op.apply
    addf = semiring.add_monoid.binaryop.apply
    ident = semiring.add_monoid.identity(vdt)

    def body(carry, lo):
        sl = lambda x: jax.lax.dynamic_slice(x, (lo,), (step,))
        cnt, vals = _pallas_fill_merge_fold(
            a_cols2, a_vals2, b_cols2, b_vals2, sl(a_st), sl(wa),
            sl(b_st), sl(wb), width, mulf, addf, ident, vdt)
        return carry, (cnt, vals)

    if nchunks == 1:
        _, (cnt, vals) = body(0, jnp.int32(0))
        return cnt, vals
    _, (cnts, vals) = jax.lax.scan(
        body, 0, jnp.arange(nchunks, dtype=jnp.int32) * step)
    return cnts.reshape(-1), vals.reshape(-1)


def _bucket_counts_one(a_cols2, b_cols2, a_st, wa, b_st, wb, width,
                       step, nchunks):
    """One width bucket: lax.scan over its chunks (each fused
    fill+merge+count), returning int32 match counts for nchunks*step
    edges."""
    import os as _os
    fused = _os.environ.get("PYGB_PAIR_FUSED", "1") != "0"

    def body(carry, lo):
        sl = lambda x: jax.lax.dynamic_slice(x, (lo,), (step,))
        if fused:
            cnt = _pallas_fill_merge_count(
                a_cols2, b_cols2, sl(a_st), sl(wa), sl(b_st), sl(wb),
                width)
            return carry, cnt
        keys = _pallas_fill_keys(a_cols2, b_cols2, sl(a_st), sl(wa),
                                 sl(b_st), sl(wb), width)
        ks = _bitonic_merge(keys) if width <= 4096 \
            else jax.lax.sort(keys, dimension=1)
        match = (ks[:, :-1] >> 1) == (ks[:, 1:] >> 1)
        return carry, jnp.sum(match.astype(jnp.int32), axis=1)

    if nchunks == 1:
        _, cnt = body(0, jnp.int32(0))
        return cnt
    _, cnts = jax.lax.scan(
        body, 0, jnp.arange(nchunks, dtype=jnp.int32) * step)
    return cnts.reshape(-1)


@partial(jax.jit, static_argnames=("spec",))
def _all_bucket_counts(a_cols2, b_cols2, ast_all, wa_all, bst_all,
                       wb_all, spec):
    """EVERY pair width bucket of a masked SpGEMM in ONE dispatch: the
    per-bucket (a_st, wa, b_st, wb) arrays are concatenated into 4
    device arrays (4 uploads instead of 4 per bucket — each upload
    costs a tunnel round trip); `spec` is a static tuple of
    (offset, width, step, nchunks) giving each bucket's slice."""
    outs = []
    for (off, width, step, nchunks) in spec:
        npad = step * nchunks
        sl = slice(off, off + npad)
        outs.append(_bucket_counts_one(
            a_cols2, b_cols2, ast_all[sl], wa_all[sl], bst_all[sl],
            wb_all[sl], width, step, nchunks))
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


@partial(jax.jit, static_argnames=("spec",))
def _all_bucket_counts_tab(a_cols2, b_cols2, lrp, lcp, st_a, dg_a,
                           st_b, dg_b, spec):
    """Table variant of `_all_bucket_counts`: uploads the PERMUTED mask
    ids (2 arrays) plus the dense per-row (start, degree) tables, and
    derives each bucket's (a_st, wa, b_st, wb) with device gathers —
    ~45% fewer bytes over the 46 MB/s tunnel than the 4 scalar
    arrays.  Usable when both row-id spaces fit a dense table."""
    ast_all = jnp.take(st_a, lrp)
    wa_all = jnp.take(dg_a, lrp)
    bst_all = jnp.take(st_b, lcp)
    wb_all = jnp.take(dg_b, lcp)
    outs = []
    for (off, width, step, nchunks) in spec:
        npad = step * nchunks
        sl = slice(off, off + npad)
        outs.append(_bucket_counts_one(
            a_cols2, b_cols2, ast_all[sl], wa_all[sl], bst_all[sl],
            wb_all[sl], width, step, nchunks))
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


@partial(jax.jit, static_argnames=("semiring", "out_dtype", "width",
                                   "narrow"))
def _bucket_build_intersect(a_cols, a_vals, b_cols, b_vals, a_st, wa,
                            b_st, wb, mi, mj, semiring, out_dtype, width,
                            narrow):
    """Build the side-tagged sorted-concat input for one width bucket ON
    DEVICE (the reference-free host fill was the dominant cost) and run
    the intersect.  Per mask edge e: lanes [0, wa) hold A-row entries,
    [wa, wa+wb) B-row entries, the rest distinct pad sentinels."""
    lane = jnp.arange(width, dtype=jnp.int32)[None, :]
    in_a = lane < wa[:, None]
    in_b = jnp.logical_and(lane >= wa[:, None],
                           lane < (wa + wb)[:, None])
    src_a = jnp.clip(a_st[:, None] + lane, 0, a_cols.shape[0] - 1)
    src_b = jnp.clip(b_st[:, None] + lane - wa[:, None], 0,
                     b_cols.shape[0] - 1)
    # int32 keys when column ids fit in 30 bits (halves the sort cost)
    kt = jnp.int32 if narrow else jnp.int64
    sent = (jnp.int32(1) << 30 if narrow else jnp.int64(1) << 62)
    ka = jnp.take(a_cols, src_a).astype(kt)
    kb = jnp.take(b_cols, src_b).astype(kt)
    keys = jnp.where(in_a, ka * 2,
                     jnp.where(in_b, kb * 2 + 1,
                               sent + 2 * lane.astype(kt)))
    va = jnp.where(in_a, jnp.take(a_vals, src_a),
                   jnp.zeros((), a_vals.dtype))
    vb = jnp.where(in_b, jnp.take(b_vals, src_b),
                   jnp.zeros((), b_vals.dtype))
    return _bucket_intersect(keys, va, vb, mi, mj, semiring, out_dtype,
                             width)


def _bucket_intersect(keys, vals_a, vals_b, mi, mj, semiring, out_dtype,
                      width):
    """One bucket: keys (E, W) = side-tagged sorted-concat input.

    keys = k*2 + side (side 0 = A-list entry, 1 = B-list entry); padding
    uses a sentinel larger than any real key.  After the lane sort,
    a match is adjacent keys with equal k: A-side lands first, so the
    product is mul(vals[p], vals[p+1]).
    """
    out_dtype = np.dtype(out_dtype)
    add = semiring.add_monoid.binaryop
    mul = semiring.mul_op
    ident = jnp.asarray(semiring.add_monoid.identity(out_dtype))

    # PAIR-family muls never read the value payloads: sorting the keys
    # alone cuts the (dominant) sort traffic 3x — this is the triangle
    # counting / k-truss path
    payload_free = (not mul.positional) and mul.builtin and mul.op == "PAIR"
    if payload_free:
        ks = jax.lax.sort(keys, dimension=1)
        va = vb = None
    else:
        ks, va, vb = jax.lax.sort((keys, vals_a, vals_b), dimension=1,
                                  num_keys=1)
    k_lo = ks[:, :-1]
    k_hi = ks[:, 1:]
    match = (k_lo >> 1) == (k_hi >> 1)
    if payload_free:
        prod = jnp.ones(match.shape, out_dtype)
    elif mul.positional:
        kk = (k_lo >> 1).astype(jnp.int64)
        pos = dict(i0=mi[:, None], j0=kk, i1=kk, j1=mj[:, None])
        prod = mul.apply(None, None, pos).astype(out_dtype)
        prod = jnp.broadcast_to(prod, match.shape)
    else:
        prod = mul.apply(va[:, :-1].astype(out_dtype),
                         vb[:, 1:].astype(out_dtype))
    name = add.op if add.builtin else None
    if name == "PLUS":
        c = jnp.sum(jnp.where(match, prod, jnp.zeros((), out_dtype)),
                    axis=1)
    elif name == "MIN":
        c = jnp.min(jnp.where(match, prod, ident), axis=1)
    elif name == "MAX":
        c = jnp.max(jnp.where(match, prod, ident), axis=1)
    elif name == "TIMES":
        c = jnp.prod(jnp.where(match, prod, ident), axis=1)
    elif name in ("LOR", "ANY"):
        c = jnp.any(jnp.logical_and(match, prod != 0), axis=1)
        c = c.astype(out_dtype)
    elif name == "LAND":
        c = jnp.all(jnp.where(match, prod != 0, True), axis=1)
        c = c.astype(out_dtype)
    else:
        v, m = _masked_tree_reduce(prod, match, add.apply, axis=1)
        c = jnp.where(m, v, ident)
    cnt = jnp.sum(match.astype(jnp.int32), axis=1)
    return c, cnt


def masked_spgemm(a_rows, a_cols, a_vals, bt_rows, bt_cols, bt_vals,
                  m_rows, m_cols, semiring, out_dtype, transpose_note=""):
    """C<M> = A (+.x) B with B supplied TRANSPOSED (bt = rows of B^T).

    All index arrays are canonical (row-sorted) host numpy COO.  Returns
    (rows, cols, vals) of C restricted to present results.
    """
    import os as _os
    import time as _time
    _prof = _os.environ.get("PYGB_SPGEMM_PROFILE") == "1"
    _marks = [("start", _time.perf_counter())]

    def _mark(name):
        if _prof:
            _marks.append((name, _time.perf_counter()))

    out_dtype = np.dtype(out_dtype)
    nmask = len(m_rows)
    if nmask == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, out_dtype))

    ua, sa, da = _csr_of(a_rows, a_cols, a_vals)
    ub, sb, db = _csr_of(bt_rows, bt_cols, bt_vals)
    a_st, wa = _row_lookup(ua, sa, da, m_rows)
    b_st, wb = _row_lookup(ub, sb, db, m_cols)
    _mark("csr+lookup")
    total = wa + wb
    out_vals = np.zeros(nmask, out_dtype)
    out_cnt = np.zeros(nmask, np.int64)

    # heavy edges: host-side sorted intersections, products and folds
    # batched so there are at most O(log) device calls total (a
    # per-product device sync here stalls for hours through the remote
    # TPU tunnel)
    heavy = total > WIDTH_CAP
    if heavy.any():
        burble("masked_spgemm: %d heavy edges via host intersect",
               int(heavy.sum()))
        segs, vas, vbs, coms, eids = [], [], [], [], []
        for e in np.nonzero(heavy)[0]:
            ka = a_cols[a_st[e]:a_st[e] + wa[e]]
            kb = bt_cols[b_st[e]:b_st[e] + wb[e]]
            common, ia, ib = np.intersect1d(ka, kb, assume_unique=True,
                                            return_indices=True)
            if len(common):
                vas.append(a_vals[a_st[e] + ia])
                vbs.append(bt_vals[b_st[e] + ib])
                coms.append(common)
                eids.append(np.full(len(common), e, np.int64))
                out_cnt[e] = len(common)
        if eids:
            from .spmspv import _NP_MUL
            from .sparse import segment_fold_generic

            eid = np.concatenate(eids)
            va = np.concatenate(vas)
            vb = np.concatenate(vbs)
            mul = semiring.mul_op
            if mul.positional:
                key, off = mul.positional
                com = np.concatenate(coms)
                src = dict(i0=m_rows[eid], j0=com, i1=com, j1=m_cols[eid])
                prods = (src[key] + off).astype(out_dtype)
            elif mul.builtin and mul.op in _NP_MUL:
                prods = _NP_MUL[mul.op](va.astype(out_dtype),
                                        vb.astype(out_dtype))\
                    .astype(out_dtype)
            else:
                prods = np.asarray(mul.apply(
                    jnp.asarray(va.astype(out_dtype)),
                    jnp.asarray(vb.astype(out_dtype)))).astype(out_dtype)
            ue, red = segment_fold_generic(eid, prods,
                                           semiring.add_monoid)
            out_vals[ue] = red

    # bucket the rest by pow2 width; the (E, W) concat build runs on
    # device (host transfers are E-sized scalars + the COO arrays once)
    _mark("heavy")
    light = ~heavy
    # pow2 width menu: measured better end-to-end than a coarser (x4)
    # menu — the wider sort kernels the coarse menu forces compile much
    # slower than the extra pow2 variants
    widths = np.maximum(8, 2 ** np.ceil(
        np.log2(np.maximum(total, 1))).astype(np.int64))

    maxcol = max(int(a_cols.max()) if len(a_cols) else 0,
                 int(bt_cols.max()) if len(bt_cols) else 0)
    narrow = maxcol < (1 << 29)

    from .sparse import _next_pow2

    def _pow2_pad(arr, dtype):
        # pow2-padded device arrays: iterative algorithms (k-truss)
        # shrink nnz every pass; fixed shape buckets reuse executables
        out = np.zeros(_next_pow2(max(1, len(arr))), dtype)
        out[:len(arr)] = arr
        return jnp.asarray(out)

    # generic-path operand uploads are LAZY: when every bucket takes the
    # pair_fast kernel (TC / k-truss), these 4 device_puts never happen
    _gen_ops = []

    def _generic_operands():
        if not _gen_ops:
            _gen_ops.append((_pow2_pad(a_cols, np.int64),
                             _pow2_pad(a_vals, out_dtype),
                             _pow2_pad(bt_cols, np.int64),
                             _pow2_pad(bt_vals, out_dtype)))
        return _gen_ops[0]

    mul0 = semiring.mul_op
    add0 = semiring.add_monoid.binaryop
    # the fused fill+sort+count kernel computes the PLUS reduction (the
    # match count); for idempotent monoids over all-ones products the
    # value is simply 1 wherever any match exists.  BXOR/BXNOR (count
    # parity) and user monoids go through the generic intersect path.
    add_is_plus = add0.builtin and add0.op == "PLUS"
    add_is_one = add0.builtin and add0.op in (
        "MIN", "MAX", "TIMES", "ANY", "LOR", "LAND", "BOR", "BAND")
    pair_fast = (narrow and not mul0.positional and mul0.builtin
                 and mul0.op == "PAIR"
                 and (add_is_plus or add_is_one)
                 # both column arrays stay VMEM-resident in the fused
                 # kernel: 24MB each (+ scratch + slabs) fits v5e's
                 # 128MB VMEM; kron-18-scale graphs now take the fast
                 # path instead of the XLA-gather generic buckets
                 and (len(a_cols) + 2560) * 4 <= (24 << 20)
                 and (len(bt_cols) + 2560) * 4 <= (24 << 20)
                 and jax.default_backend() == "tpu")
    # VALUED fused path: any non-positional semiring whose mul/add
    # trace over 4-byte int/float arrays (builtin or user-defined);
    # value slabs double the VMEM residency, so half the size cap
    val_fast = (not pair_fast and narrow and not mul0.positional
                and mul0.udt is None
                and np.dtype(out_dtype).kind in "fi"
                and (len(a_cols) + 2560) * 8 <= (24 << 20)
                and (len(bt_cols) + 2560) * 8 <= (24 << 20)
                and jax.default_backend() == "tpu"
                and _os.environ.get("PYGB_VAL_FUSED", "1") != "0")
    if pair_fast or val_fast:
        def _as2d(cols, dt=np.int32):
            # +10 rows of tail padding: the fused kernel's slab loads
            # read up to GW+1=9 rows past a segment's last window
            ar = np.zeros((-(-(len(cols) + 1280) // 128)) * 128, dt)
            ar[:len(cols)] = cols.astype(dt)
            return jnp.asarray(ar.reshape(-1, 128))
        a_cols2 = _as2d(a_cols if len(a_cols) else np.zeros(1, np.int64))
        b_cols2 = _as2d(bt_cols if len(bt_cols) else np.zeros(1, np.int64))
        # the fill kernel works in whole 128-lane windows: clamping the
        # narrow buckets up to 128 pads their rows <=16x but keeps them
        # on the Pallas fill+bitonic-merge path — measured ~100x faster
        # than the XLA-gather generic bucket they otherwise take (the
        # dominant warm cost of TC/k-truss, r5 profile)
        widths = np.maximum(widths, 128)
    if val_fast:
        vdt = np.dtype(np.float32 if np.dtype(out_dtype).kind == "f"
                       else np.int32)
        a_vals2 = _as2d(a_vals if len(a_vals) else np.zeros(1, vdt),
                        vdt)
        b_vals2 = _as2d(bt_vals if len(bt_vals) else np.zeros(1, vdt),
                        vdt)

    def _pow2_len(n, quantum):
        return max(quantum, _next_pow2(n))

    # every bucket/chunk result stays ON DEVICE; one batched pull at the
    # end (each per-chunk np.asarray costs a full tunnel round trip,
    # ~40 ms — the dominant warm-run cost before this batching).  Bucket
    # membership via one argsort instead of a nonzero() scan per width.
    parts = []          # (sel indices, pad_len, c_dev, cnt_dev, is_pair)
    pair_sels = []      # per pair bucket: (sel indices, padded length)
    pair_spec = []      # per pair bucket: (width, step, nchunks)
    light_idx = np.nonzero(light)[0]
    worder = np.argsort(widths[light_idx], kind="stable")
    wsorted = widths[light_idx][worder]
    wstarts = np.flatnonzero(np.concatenate(
        [[True], wsorted[1:] != wsorted[:-1]]))
    for si, s0 in enumerate(wstarts):
        s1 = wstarts[si + 1] if si + 1 < len(wstarts) else len(wsorted)
        w = int(wsorted[s0])
        sel = light_idx[worder[s0:s1]]
        if pair_fast and w >= 128:  # kernel fills whole 128-lane windows
            # chunk: the per-edge scalar arrays live whole in SMEM
            step = min(32768, max(8, (1 << 21) // int(w)) * 8)
            nchunks = -(-len(sel) // step)
            # pow2-pad the chunk count so shrinking iterative workloads
            # (k-truss) reuse the (width, step, nchunks) executable
            nchunks = _next_pow2(nchunks)
            npad = nchunks * step

            pair_sels.append((sel, npad))
            pair_spec.append((int(w), int(step), int(nchunks)))
            continue
        if val_fast and w >= 128:
            step = min(32768, max(8, (1 << 21) // int(w)) * 8)
            nchunks = _next_pow2(-(-len(sel) // step))
            npad = nchunks * step

            def _vbpad(arr):
                o = np.zeros(npad, np.int32)
                o[:len(sel)] = arr
                return jnp.asarray(o)

            cnt, vals = _fill_fold_bucket(
                a_cols2, a_vals2, b_cols2, b_vals2,
                _vbpad(a_st[sel].astype(np.int32)),
                _vbpad(wa[sel].astype(np.int32)),
                _vbpad(b_st[sel].astype(np.int32)),
                _vbpad(wb[sel].astype(np.int32)),
                semiring, vdt.str, int(w), int(step), int(nchunks))
            parts.append((sel, npad, vals, cnt, False))
            continue
        # chunk so the (E, width) expansion stays bounded: a 4M-edge
        # width-2048 bucket would otherwise materialize ~200 GB
        # (hyperdnn bias mxm OOM, r5)
        chunk = max(8, _pow2_len((1 << 24) // max(int(w), 1), 8))
        for lo in range(0, len(sel), chunk):
            selc = sel[lo:lo + chunk]
            e_p2 = _pow2_len(len(selc), 8)

            def _pad32(arr, fill=0):
                o = np.full(e_p2, fill, np.int32)
                o[:len(selc)] = arr
                return jnp.asarray(o)

            def _pad64(arr):
                o = np.zeros(e_p2, np.int64)
                o[:len(selc)] = arr
                return jnp.asarray(o)

            a_cols_d, a_vals_d, b_cols_d, b_vals_d = _generic_operands()
            c, cnt = _bucket_build_intersect(
                a_cols_d, a_vals_d, b_cols_d, b_vals_d,
                _pad32(a_st[selc].astype(np.int32)),
                _pad32(wa[selc].astype(np.int32)),
                _pad32(b_st[selc].astype(np.int32)),
                _pad32(wb[selc].astype(np.int32)),
                _pad64(m_rows[selc]), _pad64(m_cols[selc]),
                semiring, out_dtype, int(w), bool(narrow))
            parts.append((selc, e_p2, c, cnt, False))

    if pair_spec:
        total_pad = sum(npad for _, npad in pair_sels)
        hi_a = (int(ua[-1]) + 1) if len(ua) else 1
        hi_b = (int(ub[-1]) + 1) if len(ub) else 1
        use_tab = (hi_a <= (1 << 20) and hi_b <= (1 << 20)
                   and 16 * (hi_a + hi_b) < 8 * total_pad)
        spec2 = []
        off = 0
        if use_tab:
            # pre-permuted mask ids + dense row tables: ~half the
            # upload bytes of the 4 scalar arrays
            lrp = np.full(total_pad, hi_a, np.int32)  # pad id -> (0,0)
            lcp = np.full(total_pad, hi_b, np.int32)
            for (sel, npad), (w, step, nchunks) in zip(pair_sels,
                                                       pair_spec):
                lrp[off:off + len(sel)] = m_rows[sel]
                lcp[off:off + len(sel)] = m_cols[sel]
                spec2.append((off, w, step, nchunks))
                off += npad

            def _tab(hi, u, s, d):
                st = np.zeros(hi + 1, np.int32)
                dg = np.zeros(hi + 1, np.int32)
                st[u] = s
                dg[u] = d
                return jnp.asarray(st), jnp.asarray(dg)

            st_a, dg_a = _tab(hi_a, ua, sa, da)
            st_b, dg_b = _tab(hi_b, ub, sb, db)
            cnt_all_pair = _all_bucket_counts_tab(
                a_cols2, b_cols2, jnp.asarray(lrp), jnp.asarray(lcp),
                st_a, dg_a, st_b, dg_b, tuple(spec2))
        else:
            # concatenate every bucket's scalar arrays into 4 uploads
            ast_all = np.zeros(total_pad, np.int32)
            wa_all = np.zeros(total_pad, np.int32)
            bst_all = np.zeros(total_pad, np.int32)
            wb_all = np.zeros(total_pad, np.int32)
            for (sel, npad), (w, step, nchunks) in zip(pair_sels,
                                                       pair_spec):
                ast_all[off:off + len(sel)] = a_st[sel]
                wa_all[off:off + len(sel)] = wa[sel]
                bst_all[off:off + len(sel)] = b_st[sel]
                wb_all[off:off + len(sel)] = wb[sel]
                spec2.append((off, w, step, nchunks))
                off += npad
            cnt_all_pair = _all_bucket_counts(
                a_cols2, b_cols2, jnp.asarray(ast_all),
                jnp.asarray(wa_all), jnp.asarray(bst_all),
                jnp.asarray(wb_all), tuple(spec2))
        off = 0
        for (sel, npad) in pair_sels:
            parts.append((sel, npad, None,
                          cnt_all_pair[off:off + npad], True))
            off += npad
    _mark("bucket_dispatch")
    if parts:
        # pair chunks never pull c: the products are all 1, so the PLUS
        # value IS the int32 match count (and idempotent monoids only
        # need cnt > 0) — for TC/k-truss the whole result is ONE int32
        # transfer
        cnt_all = np.asarray(jnp.concatenate([p[3] for p in parts]))
        _mark("device_sync_pull")
        gen_parts = [p for p in parts if not p[4]]
        c_gen = np.asarray(jnp.concatenate(
            [p[2].astype(out_dtype) for p in gen_parts])) \
            if gen_parts else None
        off = 0
        goff = 0
        for ss, pad_len, _c, _n, is_pair_chunk in parts:
            cnt_h = cnt_all[off:off + len(ss)]
            if is_pair_chunk:
                if add_is_plus:
                    out_vals[ss] = cnt_h.astype(out_dtype)
                else:   # idempotent monoid over all-1 products
                    out_vals[ss] = (cnt_h > 0).astype(out_dtype)
            else:
                out_vals[ss] = c_gen[goff:goff + len(ss)]
                goff += pad_len
            out_cnt[ss] = cnt_h
            off += pad_len

    present = out_cnt > 0
    if _prof:
        _mark("scatter")
        import sys as _sys
        line = " ".join(f"{n}={t1 - t0:.3f}" for (n, t1), (_, t0)
                        in zip(_marks[1:], _marks[:-1]))
        print(f"# spgemm_profile nmask={nmask} nparts={len(parts)} "
              f"{line}", file=_sys.stderr, flush=True)
    return (m_rows[present], m_cols[present], out_vals[present])
