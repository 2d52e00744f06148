"""SpMSpV: semiring matrix-vector product with a SPARSE vector.

The frontier formulation (SURVEY §2.3 "merge-based SpMV/SpMSpV",
reference BFS loop §3.3): for a frontier x given as (index, value)
packets, only the matrix rows the frontier touches are read —
per-call cost is O(frontier edges), not O(n) or O(nnz).

Pipeline: sorted-search the frontier ids against the matrix's in-id
CSR segments (host, vectorized), expand the touched edge ranges,
apply the semiring multiply, then a compact segment reduce by out-id
(device kernel over #distinct outputs).  High-diameter graphs (road
networks) keep per-level work proportional to the frontier instead of
doing n-work per level (VERDICT r1 missing #4).
"""

import numpy as np
import jax.numpy as jnp

from .spgemm import _row_lookup
from .sparse import coo_segment_reduce_compact


_NP_MUL = {
    "TIMES": np.multiply,
    "PLUS": np.add,
    "MINUS": np.subtract,
    "MIN": np.minimum,
    "MAX": np.maximum,
    "DIV": np.divide,
    "FIRST": lambda a, x: a,
    "SECOND": lambda a, x: x,
    "PAIR": lambda a, x: np.ones_like(a),
    "LAND": lambda a, x: a.astype(bool) & x.astype(bool),
    "LOR": lambda a, x: a.astype(bool) | x.astype(bool),
}


def expand_segments(starts, degs):
    """Concatenated ranges [starts_i, starts_i+degs_i) plus the source
    entry index of each expanded element."""
    total = int(degs.sum())
    ent = np.repeat(np.arange(len(degs)), degs)
    if total == 0:
        return ent, np.empty(0, np.int64)
    base = np.repeat(starts, degs)
    run0 = np.repeat(np.cumsum(degs) - degs, degs)
    return ent, base + (np.arange(total) - run0)


def spmspv(u, s, d, in_sorted_out_ids, in_sorted_vals, fi, fx,
           semiring, out_dtype, flip_mul=False):
    """y = A (+.x) x over the frontier (fi, fx).

    (u, s, d): unique in-ids / segment starts / degrees of the matrix
    sorted by in-id; in_sorted_out_ids/vals: the out-id and value of
    each edge in that order.  Returns (unique out ids, values).
    """
    out_dtype = np.dtype(out_dtype)
    st, dg = _row_lookup(u, s, d, fi)
    ent, offs = expand_segments(st, dg)
    if len(offs) == 0:
        return np.empty(0, np.int64), np.empty(0, out_dtype)
    out_ids = in_sorted_out_ids[offs]
    av = in_sorted_vals[offs]
    xv = fx[ent]
    mul = semiring.mul_op
    add_bin = semiring.add_monoid.binaryop
    is_struct = av.dtype.names is not None or xv.dtype.names is not None
    np_mul = _NP_MUL.get(mul.op) if (mul.builtin
                                     and not mul.positional) else None
    if is_struct or not (add_bin.builtin and add_bin.op in (
            "PLUS", "MIN", "MAX", "TIMES", "LOR", "LAND", "LXOR", "ANY")):
        # struct UDTs / user monoids: struct-aware multiply + generic
        # identity-free segment fold
        from .sparse import segment_fold_generic

        prod = np.asarray(mul.apply(xv, av) if flip_mul
                          else mul.apply(av, xv))
        order = np.argsort(out_ids, kind="stable")
        return segment_fold_generic(out_ids[order], prod[order],
                                    semiring.add_monoid)
    if np_mul is not None:
        a1, a2 = (xv, av) if flip_mul else (av, xv)
        if out_dtype == np.bool_:
            prod = np_mul(a1.astype(bool), a2.astype(bool))\
                .astype(out_dtype)
        else:
            prod = np_mul(a1.astype(out_dtype),
                          a2.astype(out_dtype)).astype(out_dtype)
    elif mul.positional:
        # same operand-role convention as core/sparse.py coo_spmv
        in_ids = fi[ent]
        z = np.zeros(len(in_ids), np.int64)
        if flip_mul:   # vxm: first = x' (row vector), second = A
            pos = dict(i0=jnp.asarray(z), j0=jnp.asarray(in_ids),
                       i1=jnp.asarray(in_ids), j1=jnp.asarray(out_ids))
        else:          # mxv: first = A, second = x
            pos = dict(i0=jnp.asarray(out_ids), j0=jnp.asarray(in_ids),
                       i1=jnp.asarray(in_ids), j1=jnp.asarray(z))
        prod = np.asarray(mul.apply(None, None, pos)).astype(out_dtype)
        prod = np.broadcast_to(prod, out_ids.shape).copy() \
            if prod.shape != out_ids.shape else prod
    else:
        a1, a2 = (xv, av) if flip_mul else (av, xv)
        prod = np.asarray(mul.apply(
            jnp.asarray(a1.astype(out_dtype)),
            jnp.asarray(a2.astype(out_dtype)))).astype(out_dtype)
    return coo_segment_reduce_compact(out_ids, prod, semiring.add_monoid,
                                      out_dtype)
