"""Sorted-COO staging utilities (host side).

The builder tier of the storage system: matrices whose logical dimensions
exceed the dense-bitmap budget live as sorted, deduplicated COO triples on
the host (the analog of SuiteSparse's hypersparse format + pending-tuple
model, reference ``matrix.py:167-170``, ``base.py:38``).  Compute ops
ship these as device arrays (see ``core/sparse.py``); the functions here
cover construction, mutation staging, and the O(nnz log nnz) host-side
re-arrangements (sort/dedup/merge) that precede device dispatch.

Indices are int64 pairs sorted lexicographically by (row, col), so the
full GxB_INDEX_MAX = 2^60 logical index space is supported.
"""

import numpy as np

_PAIR_DTYPE = np.dtype([("r", np.int64), ("c", np.int64)])


def _pairs(rows, cols):
    a = np.empty(rows.size, dtype=_PAIR_DTYPE)
    a["r"] = rows
    a["c"] = cols
    return a


def build(rows, cols, vals, dtype, dedup="last"):
    """Sort by (row, col) and deduplicate; returns canonical COO triples.

    dedup: "last" (setElement semantics: later writes win).  Large builds
    go through the native radix-sort runtime when available
    (native/fastio.cpp).
    """
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals, dtype)
    if rows.size == 0:
        return rows, cols, vals
    # already canonical (strictly (row, col)-sorted, no dups): the
    # common case for op RESULTS (tril/triu, masked SpGEMM inherit the
    # sorted mask order) — the O(n) check skips the O(n log n) sort
    if rows.size > 1:
        rs, cs = rows[1:], cols[1:]
        rp, cp = rows[:-1], cols[:-1]
        if bool(np.all((rs > rp) | ((rs == rp) & (cs > cp)))):
            return rows, cols, vals
    else:
        return rows, cols, vals
    dt = np.dtype(dtype)
    f64_safe = dt.kind == "f" or (dt.kind in "iu" and dt.itemsize <= 4)
    if rows.size >= 65536 and f64_safe and rows.min() >= 0:
        from ..io.native import HAVE_NATIVE, sort_dedup_native

        if HAVE_NATIVE:
            r, c, v = sort_dedup_native(
                rows, cols, vals.astype(np.float64))
            return r, c, v.astype(dtype)
    order = np.lexsort((cols, rows))  # stable, row-major
    rows = rows[order]
    cols = cols[order]
    vals = vals[order]
    uniq = np.empty(rows.shape, bool)
    uniq[:-1] = (rows[:-1] != rows[1:]) | (cols[:-1] != cols[1:])
    uniq[-1] = True
    return rows[uniq], cols[uniq], vals[uniq]


def merge_pending(rows, cols, vals, pend_rows, pend_cols, pend_vals, dtype):
    """Fold pending (later-wins) tuples into canonical COO."""
    all_r = np.concatenate([rows, np.asarray(pend_rows, np.int64)])
    all_c = np.concatenate([cols, np.asarray(pend_cols, np.int64)])
    all_v = np.concatenate([vals, np.asarray(pend_vals, dtype)])
    return build(all_r, all_c, all_v, dtype)


def find(rows, cols, i, j):
    """Index of entry (i, j) in canonical COO, or -1."""
    if rows.size == 0:
        return -1
    lo = np.searchsorted(rows, i, side="left")
    hi = np.searchsorted(rows, i, side="right")
    if lo == hi:
        return -1
    pos = lo + np.searchsorted(cols[lo:hi], j)
    if pos < hi and cols[pos] == j:
        return int(pos)
    return -1


def remove(rows, cols, vals, i, j):
    pos = find(rows, cols, i, j)
    if pos < 0:
        return rows, cols, vals, False
    keep = np.ones(rows.shape, bool)
    keep[pos] = False
    return rows[keep], cols[keep], vals[keep], True


def ewise(rows_a, cols_a, vals_a, rows_b, cols_b, vals_b, fn, dtype,
          union=True):
    """Element-wise union (eadd) or intersection (emult) of two canonical
    COOs.  `fn` operates on numpy arrays of the matched entries.

    One native linear merge pass (core/coosem.py) — no intersect1d
    binary searches and no post-merge re-sort (those cost ~5x the merge
    at GAP scale on a bandwidth-bound host)."""
    from .coosem import pair_keys, union_merge, _merge_union_idx

    if union:
        return union_merge(rows_a, cols_a, vals_a, rows_b, cols_b,
                           vals_b, fn, dtype)
    if len(rows_a) == 0 or len(rows_b) == 0:
        e = np.empty(0, np.int64)
        return e, e.copy(), np.empty(0, dtype)
    ka, kb = pair_keys(rows_a, cols_a, rows_b, cols_b)
    ia, ib = _merge_union_idx(ka, kb)
    both = (ia >= 0) & (ib >= 0)
    ai, bi = ia[both], ib[both]
    return (np.asarray(rows_a[ai], np.int64),
            np.asarray(cols_a[ai], np.int64),
            np.asarray(fn(vals_a[ai], vals_b[bi]), dtype))


def extract(rows, cols, vals, row_idx, col_idx):
    """Extract the submatrix at (row_idx, col_idx) index vectors,
    renumbered to the output coordinate space."""
    row_idx = np.asarray(row_idx, np.int64)
    col_idx = np.asarray(col_idx, np.int64)
    rmap = {int(r): k for k, r in enumerate(row_idx)}
    cmap = {int(c): k for k, c in enumerate(col_idx)}
    out_r, out_c, out_v = [], [], []
    for r, c, v in zip(rows, cols, vals):
        ri = rmap.get(int(r))
        ci = cmap.get(int(c))
        if ri is not None and ci is not None:
            out_r.append(ri)
            out_c.append(ci)
            out_v.append(v)
    return (np.asarray(out_r, np.int64), np.asarray(out_c, np.int64),
            np.asarray(out_v, vals.dtype))
