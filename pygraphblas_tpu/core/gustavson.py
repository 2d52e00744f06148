"""Unmasked sparse SpGEMM: C = A (+.x) B on canonical COO triples.

Two-phase Gustavson split TPU-style (SURVEY §7 hard-part #2):

1. **Symbolic phase (host, C-kernel):** the output *pattern* is the
   structural product of the two patterns.  We relabel the three index
   spaces compactly (logical dims go up to 2^60) and run an integer
   counts matmul through scipy's C Gustavson kernel — counts are >= 1
   for every structural match, so no entry is ever pruned, preserving
   GraphBLAS structural semantics (explicit zeros stay stored).
2. **Numeric phase:** with the pattern known, the numeric fill is
   exactly the masked-SpGEMM problem, which runs on the device through
   the Pallas bucket-intersect kernels (core/spgemm.py) for any
   semiring.  For the PLUS_{TIMES,FIRST,SECOND,PAIR} family the values
   are a scipy matmul away; pruned (exact-zero) results are re-filled
   against the symbolic pattern.

Replaces the reference's unmasked ``lib.GrB_mxm``
(``pygraphblas/matrix.py:2574``), which it reaches for e.g. the
GraphChallenge DNN ``Y @ w`` (``demo/dnn/dnn.py:14-25``).
"""

import numpy as np

from ..base import burble
from . import coosem as cs


def _relabel(ra, ca, rb, cb):
    """Compact the row/k/col index spaces; k is shared by A-cols and
    B-rows."""
    ur, ri = np.unique(ra, return_inverse=True)
    uk, ki = np.unique(np.concatenate([ca, rb]), return_inverse=True)
    uc, ci = np.unique(cb, return_inverse=True)
    return (ur, ri), (uk, ki[:len(ca)], ki[len(ca):]), (uc, ci)


def pattern(ra, ca, rb, cb):
    """Structural product pattern of A @ B: canonical (rows, cols) in the
    original index space."""
    from scipy import sparse

    if len(ra) == 0 or len(rb) == 0:
        e = np.empty(0, np.int64)
        return e, e.copy()
    (ur, ri), (uk, ka, kb), (uc, ci) = _relabel(ra, ca, rb, cb)
    A = sparse.csr_matrix((np.ones(len(ra), np.int64), (ri, ka)),
                          shape=(len(ur), len(uk)))
    B = sparse.csr_matrix((np.ones(len(rb), np.int64), (kb, ci)),
                          shape=(len(uk), len(uc)))
    P = A @ B
    P.sort_indices()
    P = P.tocoo()
    return ur[P.row], uc[P.col]


_SCIPY_MULS = ("TIMES", "FIRST", "SECOND", "PAIR")


def spgemm(ra, ca, va, rb, cb, vb, semiring, out_dtype):
    """C = A (+.x) B, unmasked, canonical COO in, canonical COO out."""
    from scipy import sparse

    out_dtype = np.dtype(out_dtype)
    if len(ra) == 0 or len(rb) == 0:
        e = np.empty(0, np.int64)
        return e, e.copy(), np.empty(0, out_dtype)

    add = semiring.add_monoid.binaryop
    mul = semiring.mul_op
    plus_family = (add.builtin and add.op == "PLUS" and mul.builtin
                   and not mul.positional and mul.op in _SCIPY_MULS
                   and out_dtype.kind in "fiu")

    (ur, ri), (uk, ka, kb), (uc, ci) = _relabel(ra, ca, rb, cb)
    cnt_dt = np.int64
    Ac = sparse.csr_matrix((np.ones(len(ra), cnt_dt), (ri, ka)),
                           shape=(len(ur), len(uk)))
    Bc = sparse.csr_matrix((np.ones(len(rb), cnt_dt), (kb, ci)),
                           shape=(len(uk), len(uc)))
    P = Ac @ Bc
    P.sort_indices()
    P = P.tocoo()
    pr, pc = P.row.astype(np.int64), P.col.astype(np.int64)

    if plus_family:
        # numeric via scipy; accumulate in f64 (or i64) for accuracy
        acc_dt = np.float64 if out_dtype.kind == "f" else np.int64
        av = (np.ones(len(ra), acc_dt) if mul.op in ("SECOND", "PAIR")
              else va.astype(acc_dt))
        bv = (np.ones(len(rb), acc_dt) if mul.op in ("FIRST", "PAIR")
              else vb.astype(acc_dt))
        if mul.op == "PAIR":
            vals = P.data.astype(out_dtype)  # the counts themselves
        else:
            An = sparse.csr_matrix((av, (ri, ka)),
                                   shape=(len(ur), len(uk)))
            Bn = sparse.csr_matrix((bv, (kb, ci)),
                                   shape=(len(uk), len(uc)))
            Q = An @ Bn
            Q.sort_indices()
            Q = Q.tocoo()
            # scipy prunes exact-zero results; re-fill them as stored
            # zeros against the symbolic pattern
            vals = np.zeros(len(pr), out_dtype)
            if Q.nnz:
                hit = cs.in_sorted(pr, pc, Q.row.astype(np.int64),
                                   Q.col.astype(np.int64))
                vals[hit] = Q.data.astype(out_dtype)
        burble("unmasked spgemm (scipy %s_%s): %d x %d -> %d nnz",
               add.op, mul.op, len(ra), len(rb), len(pr))
        return ur[pr], uc[pc], vals

    # general semiring: numeric fill = masked SpGEMM with the symbolic
    # pattern as a structural mask (device bucket-intersect kernels)
    from .spgemm import masked_spgemm
    from .coosparse import build

    out_r, out_c = ur[pr], uc[pc]
    bt_r, bt_c, bt_v = build(cb, rb, vb, vb.dtype)   # B transposed
    burble("unmasked spgemm (generic %s_%s): pattern %d entries",
           add.op, mul.op, len(out_r))
    r2, c2, v2 = masked_spgemm(ra, ca, va, bt_r, bt_c, bt_v,
                               out_r, out_c, semiring, out_dtype)
    # masked_spgemm returns only entries with a nonempty intersection,
    # which for the structural pattern is every entry
    return r2, c2, v2
