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

WIDTH_CAP = 8192


def _csr_of(rows, cols, vals):
    """rows sorted -> (unique rows, starts, degrees)."""
    u, s, d = np.unique(rows, return_index=True, return_counts=True)
    return u, s, d


def _row_lookup(nrows, u, s, d):
    starts = np.zeros(nrows, np.int64)
    degs = np.zeros(nrows, np.int64)
    starts[u] = s
    degs[u] = d
    return starts, degs


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

    ks, va, vb = jax.lax.sort((keys, vals_a, vals_b), dimension=1,
                              num_keys=1)
    k_lo = ks[:, :-1]
    k_hi = ks[:, 1:]
    match = (k_lo >> 1) == (k_hi >> 1)
    if mul.positional:
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
    out_dtype = np.dtype(out_dtype)
    nmask = len(m_rows)
    if nmask == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, out_dtype))

    ua, sa, da = _csr_of(a_rows, a_cols, a_vals)
    ub, sb, db = _csr_of(bt_rows, bt_cols, bt_vals)
    nra = int(a_rows.max()) + 1 if len(a_rows) else 1
    nrb = int(bt_rows.max()) + 1 if len(bt_rows) else 1
    a_starts, a_degs = _row_lookup(max(nra, int(m_rows.max()) + 1), ua, sa,
                                   da)
    b_starts, b_degs = _row_lookup(max(nrb, int(m_cols.max()) + 1), ub, sb,
                                   db)

    wa = a_degs[m_rows]
    wb = b_degs[m_cols]
    total = wa + wb
    out_vals = np.zeros(nmask, out_dtype)
    out_cnt = np.zeros(nmask, np.int64)

    # heavy edges: host-side sorted intersection fallback
    heavy = total > WIDTH_CAP
    if heavy.any():
        burble("masked_spgemm: %d heavy edges via host intersect",
               int(heavy.sum()))
        for e in np.nonzero(heavy)[0]:
            i, j = m_rows[e], m_cols[e]
            ka = a_cols[a_starts[i]:a_starts[i] + a_degs[i]]
            kb = bt_cols[b_starts[j]:b_starts[j] + b_degs[j]]
            common, ia, ib = np.intersect1d(ka, kb, assume_unique=True,
                                            return_indices=True)
            if len(common):
                va = a_vals[a_starts[i] + ia].astype(out_dtype)
                vb = bt_vals[b_starts[j] + ib].astype(out_dtype)
                if semiring.mul_op.positional:
                    key, off = semiring.mul_op.positional
                    src = dict(i0=np.full(len(common), i), j0=common,
                               i1=common, j1=np.full(len(common), j))
                    prods = src[key] + off
                else:
                    prods = np.asarray(semiring.mul_op.apply(
                        jnp.asarray(va), jnp.asarray(vb)))
                acc = prods[0]
                for p in prods[1:]:
                    acc = np.asarray(semiring.add_monoid.apply(
                        jnp.asarray(acc), jnp.asarray(p)))
                out_vals[e] = acc
                out_cnt[e] = len(common)

    # bucket the rest by pow2 width; the (E, W) concat build runs on
    # device (host transfers are E-sized scalars + the COO arrays once)
    light = ~heavy
    widths = np.maximum(8, 2 ** np.ceil(
        np.log2(np.maximum(total, 1))).astype(np.int64))

    maxcol = max(int(a_cols.max()) if len(a_cols) else 0,
                 int(bt_cols.max()) if len(bt_cols) else 0)
    narrow = maxcol < (1 << 29)
    a_cols_d = jnp.asarray(a_cols if len(a_cols) else np.zeros(1, np.int64))
    a_vals_d = jnp.asarray(a_vals if len(a_vals) else
                           np.zeros(1, out_dtype))
    b_cols_d = jnp.asarray(bt_cols if len(bt_cols) else
                           np.zeros(1, np.int64))
    b_vals_d = jnp.asarray(bt_vals if len(bt_vals) else
                           np.zeros(1, out_dtype))

    for w in sorted(set(widths[light].tolist())):
        sel = np.nonzero(light & (widths == w))[0]
        c, cnt = _bucket_build_intersect(
            a_cols_d, a_vals_d, b_cols_d, b_vals_d,
            jnp.asarray(a_starts[m_rows[sel]].astype(np.int32)),
            jnp.asarray(wa[sel].astype(np.int32)),
            jnp.asarray(b_starts[m_cols[sel]].astype(np.int32)),
            jnp.asarray(wb[sel].astype(np.int32)),
            jnp.asarray(m_rows[sel]), jnp.asarray(m_cols[sel]),
            semiring, out_dtype, int(w), bool(narrow))
        out_vals[sel] = np.asarray(c)
        out_cnt[sel] = np.asarray(cnt)

    present = out_cnt > 0
    return (m_rows[present], m_cols[present], out_vals[present])
