"""Full GraphBLAS write/extract/assign semantics on sorted-COO triples.

The bitmap execution tier implements ``C<M> (accum)= T`` as fused XLA
vector ops (core/dense.py:writeback).  This module is the *sparse* twin:
the same spec semantics — mask (value/structural/complement), accum
union-merge, replace — expressed as vectorized sorted-merge passes over
canonical host COO triples, so every operation works at any logical
dimension up to GxB_INDEX_MAX with O(nnz) cost.

Reference semantics being reproduced: the uniform
``(mask, accum, desc)`` kwargs of every reference operation
(``pygraphblas/matrix.py:2572-2583``) and the extract/assign index
semantics (``matrix.py:2807-3308``).

All functions take/return numpy arrays; rows/cols int64, lexicographically
sorted by (row, col) with no duplicates ("canonical").
"""

import numpy as np

_PAIR_DTYPE = np.dtype([("r", np.int64), ("c", np.int64)])


def pairs(rows, cols):
    a = np.empty(len(rows), dtype=_PAIR_DTYPE)
    a["r"] = rows
    a["c"] = cols
    return a


def in_sorted(r, c, sr, sc):
    """Boolean membership of (r, c) pairs in the canonical pair set
    (sr, sc)."""
    if len(sr) == 0 or len(r) == 0:
        return np.zeros(len(r), bool)
    k = pairs(r, c)
    sk = pairs(sr, sc)
    pos = np.searchsorted(sk, k)
    pos_c = np.minimum(pos, len(sk) - 1)
    return (pos < len(sk)) & (sk[pos_c] == k)


def truthy(vals):
    if vals.dtype == np.bool_:
        return vals
    return vals != 0


def mask_pairs(m_rows, m_cols, m_vals, structural):
    """The true-entry pair set of a mask container."""
    if structural:
        return m_rows, m_cols
    t = truthy(np.asarray(m_vals))
    return m_rows[t], m_cols[t]


def union_merge(ra, ca, va, rb, cb, vb, both_fn, dtype):
    """Pattern-union merge: both_fn(a, b) on the intersection, a-only and
    b-only entries pass through (cast to dtype).  Inputs canonical;
    output canonical."""
    ka = pairs(ra, ca)
    kb = pairs(rb, cb)
    common, ia, ib = np.intersect1d(ka, kb, assume_unique=True,
                                    return_indices=True)
    matched = np.asarray(both_fn(va[ia], vb[ib])).astype(dtype)
    only_a = np.ones(len(ka), bool)
    only_a[ia] = False
    only_b = np.ones(len(kb), bool)
    only_b[ib] = False
    rows = np.concatenate([ra[ia], ra[only_a], rb[only_b]])
    cols = np.concatenate([ca[ia], ca[only_a], cb[only_b]])
    vals = np.concatenate([matched, va[only_a].astype(dtype),
                           vb[only_b].astype(dtype)])
    order = np.lexsort((cols, rows))
    return rows[order], cols[order], vals[order]


def writeback(cr, cc, cv, tr, tc, tv, mpr, mpc, accum_fn, complement,
              replace, dtype):
    """C<M> (accum)= T on canonical COO triples.

    mpr/mpc: the mask's TRUE pair set (already value-filtered or
    structural), or None for no mask.  accum_fn: vectorized numpy
    binary fn or None.  Returns canonical triples of the new C.

    Spec: Z = accum ? union-merge(C, T, accum) : T.  Inside the
    effective mask region the result takes Z's pattern/values; outside
    it C is kept (or dropped under `replace`).
    """
    cv = np.asarray(cv)
    tv = np.asarray(tv)
    if accum_fn is None:
        zr, zc, zv = tr, tc, tv.astype(dtype)
    else:
        zr, zc, zv = union_merge(cr, cc, cv.astype(dtype), tr, tc, tv,
                                 accum_fn, dtype)

    if mpr is None:
        if not complement:
            return zr, zc, zv
        # complement of "no mask" = empty write region
        if replace:
            e = np.empty(0, np.int64)
            return e, e.copy(), np.empty(0, dtype)
        return cr, cc, cv.astype(dtype)

    z_in = in_sorted(zr, zc, mpr, mpc)
    if complement:
        z_in = ~z_in
    keep_z = (zr[z_in], zc[z_in], zv[z_in])
    if replace:
        out_r, out_c, out_v = keep_z
    else:
        c_in = in_sorted(cr, cc, mpr, mpc)
        if complement:
            c_in = ~c_in
        # outside the mask region C survives; inside, Z's pattern rules
        keep_c = (cr[~c_in], cc[~c_in], cv[~c_in].astype(dtype))
        out_r = np.concatenate([keep_z[0], keep_c[0]])
        out_c = np.concatenate([keep_z[1], keep_c[1]])
        out_v = np.concatenate([keep_z[2], keep_c[2]])
    order = np.lexsort((out_c, out_r))
    return out_r[order], out_c[order], out_v[order]


# ---------------------------------------------------------------------------
# extract / assign index plumbing
# ---------------------------------------------------------------------------


def _lookup(I):
    """Sorted-lookup tables for an index vector: maps a source index value
    to the positions in I holding it (duplicates allowed)."""
    I = np.asarray(I, np.int64)
    order = np.argsort(I, kind="stable")
    return I[order], order


def _positions(sorted_I, order, values):
    """For each value, the (possibly several) positions a with
    I[a] == value, as (expanded_entry_index, position) arrays."""
    lo = np.searchsorted(sorted_I, values, side="left")
    hi = np.searchsorted(sorted_I, values, side="right")
    cnt = hi - lo
    total = int(cnt.sum())
    ent = np.repeat(np.arange(len(values)), cnt)
    if total == 0:
        return ent, np.empty(0, np.int64)
    # concatenated ranges [lo_i, hi_i), vectorized
    starts = np.repeat(lo, cnt)
    run0 = np.repeat(np.cumsum(cnt) - cnt, cnt)
    offs = starts + (np.arange(total) - run0)
    return ent, order[offs]


def extract(rows, cols, vals, I, J):
    """out[a, b] = A[I[a], J[b]] on canonical triples; duplicates in I/J
    fan entries out.  Returns canonical triples in output coordinates."""
    I_s, I_ord = _lookup(I)
    J_s, J_ord = _lookup(J)
    # row fan-out
    ent_r, pos_r = _positions(I_s, I_ord, rows)
    r2 = pos_r
    c_src = cols[ent_r]
    v_src = vals[ent_r]
    # col fan-out of the row-expanded stream
    ent_c, pos_c = _positions(J_s, J_ord, c_src)
    out_r = r2[ent_c]
    out_c = pos_c
    out_v = v_src[ent_c]
    order = np.lexsort((out_c, out_r))
    return out_r[order], out_c[order], out_v[order]


def assign_region(cr, cc, cv, tr, tc, tv, I, J, mpr, mpc, accum_fn,
                  complement, replace, dtype):
    """C(I, J)<M> (accum)= T: GrB_assign semantics on canonical triples.

    T is in region coordinates (len(I) x len(J)); the mask pair set
    (mpr/mpc) is in C coordinates (or None).  Only the region of C is
    modified (the mask is applied restricted to the region, matching the
    dense path's `_region_mask`).  I/J must not contain duplicates.
    """
    I = np.asarray(I, np.int64)
    J = np.asarray(J, np.int64)
    # C entries inside the region, in region coordinates
    I_s, I_ord = _lookup(I)
    J_s, J_ord = _lookup(J)
    ent_r, pos_r = _positions(I_s, I_ord, cr)
    in_rows = np.zeros(len(cr), bool)
    in_rows[ent_r] = True
    row_pos = np.zeros(len(cr), np.int64)
    row_pos[ent_r] = pos_r
    ent_c, pos_c = _positions(J_s, J_ord, cc)
    in_cols = np.zeros(len(cc), bool)
    in_cols[ent_c] = True
    col_pos = np.zeros(len(cc), np.int64)
    col_pos[ent_c] = pos_c
    inside = in_rows & in_cols

    reg_cr = row_pos[inside]
    reg_cc = col_pos[inside]
    reg_cv = cv[inside]
    order = np.lexsort((reg_cc, reg_cr))
    reg_cr, reg_cc, reg_cv = reg_cr[order], reg_cc[order], reg_cv[order]

    # mask restricted to the region, in region coordinates
    if mpr is not None:
        m_ent_r, m_pos_r = _positions(I_s, I_ord, mpr)
        m_in_r = np.zeros(len(mpr), bool)
        m_in_r[m_ent_r] = True
        m_row = np.zeros(len(mpr), np.int64)
        m_row[m_ent_r] = m_pos_r
        m_ent_c, m_pos_c = _positions(J_s, J_ord, mpc)
        m_in_c = np.zeros(len(mpc), bool)
        m_in_c[m_ent_c] = True
        m_col = np.zeros(len(mpc), np.int64)
        m_col[m_ent_c] = m_pos_c
        m_in = m_in_r & m_in_c
        rm, cm = m_row[m_in], m_col[m_in]
        m_order = np.lexsort((cm, rm))
        rmpr, rmpc = rm[m_order], cm[m_order]
    else:
        rmpr = rmpc = None

    nr, nc, nv = writeback(reg_cr, reg_cc, reg_cv, tr, tc, tv,
                           rmpr, rmpc, accum_fn, complement, replace, dtype)

    # map the region result back to C coordinates, keep C outside
    out_r = np.concatenate([cr[~inside], I[nr]])
    out_c = np.concatenate([cc[~inside], J[nc]])
    out_v = np.concatenate([cv[~inside].astype(dtype), nv])
    order = np.lexsort((out_c, out_r))
    return out_r[order], out_c[order], out_v[order]


def kron(ra, ca, va, rb, cb, vb, b_nrows, b_ncols, mul_fn, dtype):
    """Kronecker product on canonical triples: out[(ia*bn + ib),
    (ja*bm + jb)] = mul(a, b)."""
    na, nb = len(ra), len(rb)
    if na == 0 or nb == 0:
        e = np.empty(0, np.int64)
        return e, e.copy(), np.empty(0, dtype)
    A = np.repeat(np.arange(na), nb)
    B = np.tile(np.arange(nb), na)
    out_r = ra[A] * b_nrows + rb[B]
    out_c = ca[A] * b_ncols + cb[B]
    out_v = np.asarray(mul_fn(va[A], vb[B])).astype(dtype)
    order = np.lexsort((out_c, out_r))
    return out_r[order], out_c[order], out_v[order]
