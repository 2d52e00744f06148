"""Sorted-COO staging utilities (host side).

The builder tier of the storage system: matrices whose logical dimensions
exceed the dense-bitmap budget live as sorted, deduplicated COO triples on
the host (the analog of SuiteSparse's hypersparse format + pending-tuple
model, reference ``matrix.py:167-170``, ``base.py:38``).  Compute ops
ship these as device arrays (see ``core/sparse.py``); the functions here
cover construction, mutation staging, and the O(nnz) host-side
re-arrangements (sort/dedup/merge) that precede device dispatch.
"""

import numpy as np

# lexicographic (row, col) sort keys: rows up to 2^32, cols up to 2^31.
_KEY_SHIFT = 31
_KEY_LIMIT = 1 << _KEY_SHIFT


def keys_of(rows, cols):
    if len(rows) and (rows.max(initial=0) >= (1 << 32) or
                      cols.max(initial=0) >= _KEY_LIMIT):
        raise ValueError(
            "entry indices above 2^31 not yet supported in sparse storage")
    return (rows.astype(np.int64) << _KEY_SHIFT) | cols.astype(np.int64)


def build(rows, cols, vals, dtype, dedup="last"):
    """Sort by (row, col) and deduplicate; returns canonical COO triples.

    dedup: "last" (setElement semantics: later writes win).
    """
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals, dtype)
    if rows.size == 0:
        return rows, cols, vals
    keys = keys_of(rows, cols)
    # stable sort then keep the last occurrence of each key
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    uniq_mask = np.empty(keys.shape, bool)
    uniq_mask[:-1] = keys[:-1] != keys[1:]
    uniq_mask[-1] = True
    sel = order[uniq_mask]
    return rows[sel], cols[sel], vals[sel]


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
    key = (np.int64(i) << _KEY_SHIFT) | np.int64(j)
    keys = keys_of(rows, cols)
    pos = np.searchsorted(keys, key)
    if pos < keys.size and keys[pos] == key:
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
    """Element-wise union (eadd) or intersection (emult) of two COOs.

    `fn` operates on numpy arrays of the matched entries.
    """
    ka = keys_of(rows_a, cols_a)
    kb = keys_of(rows_b, cols_b)
    common, ia, ib = np.intersect1d(ka, kb, assume_unique=True,
                                    return_indices=True)
    matched = np.asarray(fn(vals_a[ia], vals_b[ib]), dtype)
    if not union:
        rows = rows_a[ia]
        cols = cols_a[ia]
        return rows, cols, matched
    only_a = np.setdiff1d(np.arange(ka.size), ia, assume_unique=True)
    only_b = np.setdiff1d(np.arange(kb.size), ib, assume_unique=True)
    rows = np.concatenate([rows_a[ia], rows_a[only_a], rows_b[only_b]])
    cols = np.concatenate([cols_a[ia], cols_a[only_a], cols_b[only_b]])
    vals = np.concatenate([matched, vals_a[only_a].astype(dtype),
                           vals_b[only_b].astype(dtype)])
    return build(rows, cols, vals, dtype)


def extract(rows, cols, vals, row_idx, col_idx):
    """Extract the submatrix at (row_idx, col_idx) index vectors, renumbered
    to the output coordinate space."""
    row_idx = np.asarray(row_idx, np.int64)
    col_idx = np.asarray(col_idx, np.int64)
    # positions of each entry's row in row_idx (first match), -1 if absent
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
