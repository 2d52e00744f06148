"""Python wrapper over the native IO runtime (native/fastio.cpp).

Falls back to the pure-Python implementations when the extension is not
built (``native/build.sh`` builds it in-place).
"""

import numpy as np

try:
    from .. import _fastio

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover
    _fastio = None
    HAVE_NATIVE = False


def parse_mm_native(path):
    """Parse + canonicalize a MatrixMarket file via the C++ parser.

    Returns (rows, cols, vals, nrows, ncols, field_char).
    """
    rb, cb, vb, nrows, ncols, field = _fastio.parse_mm(str(path), True)
    rows = np.frombuffer(rb, np.int64)
    cols = np.frombuffer(cb, np.int64)
    if vb is None:
        vals = np.ones(len(rows), np.bool_)
    elif field == "i":
        vals = np.frombuffer(vb, np.float64).astype(np.int64)
    else:
        vals = np.frombuffer(vb, np.float64)
    return rows, cols, vals, nrows, ncols, field


def sort_dedup_native(rows, cols, vals):
    """Canonicalize COO triples via the C++ radix sort (last-wins)."""
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    if vals is None:
        ro, co, _ = _fastio.sort_dedup(rows.tobytes(), cols.tobytes(), None)
        return (np.frombuffer(ro, np.int64).copy(),
                np.frombuffer(co, np.int64).copy(), None)
    v64 = np.ascontiguousarray(vals, np.float64)
    ro, co, vo = _fastio.sort_dedup(rows.tobytes(), cols.tobytes(),
                                    v64.tobytes())
    return (np.frombuffer(ro, np.int64).copy(),
            np.frombuffer(co, np.int64).copy(),
            np.frombuffer(vo, np.float64).copy().astype(vals.dtype))
