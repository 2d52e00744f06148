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

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..base import burble, config
from . import coosem as cs


def _on_tpu():
    return jax.default_backend() == "tpu"


def _pow2(x, lo=8):
    p = lo
    while p < x:
        p *= 2
    return p


def _dense_ok(semiring, out_dtype, kc):
    """Algebras the dense tier may use: only those dense.mxm lowers to
    the MXU (a generic VPU fold over Mc*Kc*Nc cells is never a win)."""
    from .dense import _matmul_ok

    add = semiring.add_monoid.binaryop
    mul = semiring.mul_op
    if not (add.builtin and mul.builtin) or mul.positional:
        return False
    out_dtype = np.dtype(out_dtype)
    if add.op == "PLUS" and mul.op == "PAIR" and out_dtype != np.bool_:
        return jax.default_backend() != "tpu" or kc <= (1 << 24)
    if add.op == "PLUS" and mul.op == "TIMES" and out_dtype != np.bool_:
        return _matmul_ok(out_dtype)
    if (add.op in ("LOR", "ANY")
            and mul.op in ("LAND", "PAIR", "FIRST", "SECOND", "TIMES")
            and out_dtype == np.bool_):
        return True
    return False


def _sample_distinct_lb(arr, k=4096):
    """Cheap LOWER bound on the number of distinct values: distinct
    count of a k-element stride sample (never overestimates)."""
    if len(arr) <= k:
        return len(np.unique(arr))
    return len(np.unique(arr[:: max(1, len(arr) // k)][:k]))


def dense_spgemm(ra, ca, va, rb, cb, vb, semiring, out_dtype,
                 dims=None):
    """Compact-densify tier: relabel the present rows/inner/cols spaces,
    scatter both operands into dense (Mc,Kc)/(Kc,Nc) device arrays, and
    ride the MXU through core/dense.py's semiring matmul.  On this
    hardware a single MXU pass beats any sparse pipeline whenever the
    compact product fits the cell budget — the TPU-first answer for
    hypersparse mid-size products (graph contractions, DNN-style
    layers).  Returns canonical COO or None when it doesn't fit."""
    from . import dense as dk

    out_dtype = np.dtype(out_dtype)
    # cheap pre-reject BEFORE the O(nnz log nnz) relabel: sampled lower
    # bounds on the compact dims (the full relabel of a 4M-nnz operand
    # costs seconds and was paid per call even when this tier then
    # rejected — the r5 hyperdnn profile)
    budget = config.spgemm_dense_cells
    mc_lb = _pow2(_sample_distinct_lb(ra))
    kc_lb = _pow2(max(_sample_distinct_lb(ca), _sample_distinct_lb(rb)))
    nc_lb = _pow2(_sample_distinct_lb(cb))
    if mc_lb * kc_lb > budget or kc_lb * nc_lb > budget \
            or mc_lb * nc_lb > budget:
        return None
    (ur, ri), (uk, ka, kb), (uc, ci) = _relabel(ra, ca, rb, cb)
    mc = _pow2(len(ur))
    kc = _pow2(len(uk))
    nc = _pow2(len(uc))
    budget = config.spgemm_dense_cells
    if mc * kc > budget or kc * nc > budget or mc * nc > budget \
            or not _dense_ok(semiring, out_dtype, kc):
        return None

    vdt = np.dtype(np.float32) if out_dtype == np.bool_ else out_dtype

    def _scatter(m, k, rr, cc, vv):
        np_ = _pow2(len(rr))
        r2 = np.full(np_, m, np.int32)  # OOB pad -> dropped by scatter
        c2 = np.zeros(np_, np.int32)
        v2 = np.zeros(np_, vdt)
        r2[:len(rr)] = rr
        c2[:len(cc)] = cc
        v2[:len(vv)] = vv.astype(vdt)
        return _densify(jnp.asarray(r2), jnp.asarray(c2),
                        jnp.asarray(v2), m, k)

    av, am = _scatter(mc, kc, ri, ka, va)
    bv, bm = _scatter(kc, nc, kb, ci, vb)
    burble("unmasked spgemm (dense MXU): %dx%dx%d compact", mc, kc, nc)
    tv, tm = dk.mxm(av, am, bv, bm, semiring, out_dtype)
    packed = _pack_mask(tm)
    bits = np.asarray(packed)
    pos = np.nonzero(
        np.unpackbits(bits.view(np.uint8), bitorder="little"))[0]
    if len(pos) == 0:
        e = np.empty(0, np.int64)
        return e, e.copy(), np.empty(0, out_dtype)
    vals = np.asarray(jnp.take(tv.reshape(-1),
                               jnp.asarray(pos.astype(np.int64))))
    rr, cc = pos // nc, pos % nc
    return ur[rr], uc[cc], vals.astype(out_dtype)


@partial(jax.jit, static_argnames=("m", "k"))
def _densify(ri, ci, v, m, k):
    vals = jnp.zeros((m, k), v.dtype).at[ri, ci].set(v)
    mask = jnp.zeros((m, k), jnp.bool_).at[ri, ci].set(True)
    return vals, mask


@jax.jit
def _pack_mask(tm):
    b = tm.reshape(-1, 32).astype(jnp.uint32)
    return jnp.sum(b << jnp.arange(32, dtype=jnp.uint32)[None, :],
                   axis=1, dtype=jnp.uint32)


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

_NP_DIAG_MULS = {
    "TIMES": np.multiply, "PLUS": np.add, "MINUS": np.subtract,
    "DIV": np.divide, "MIN": np.minimum, "MAX": np.maximum,
    "FIRST": lambda a, d: a, "SECOND": lambda a, d: d,
    "PAIR": lambda a, d: np.ones_like(a),
}


def spgemm(ra, ca, va, rb, cb, vb, semiring, out_dtype, dims=None):
    """C = A (+.x) B, unmasked, canonical COO in, canonical COO out.

    Engine dispatch (``options_set(spgemm_engine=...)``): "auto" tries
    the compact-dense MXU tier, then the device expand/sort/compact
    pipeline (core/esc.py; on TPU only — its host fallback loses to
    scipy on CPU), then the host two-phase path below; "dense"/"esc"/
    "scipy" force a tier.

    `dims` = (nrows_a, inner, ncols_b) logical dims when known: small
    dims skip the O(nnz log nnz) index-compaction relabel entirely
    (it exists for 2^60 hypersparse spaces; for ordinary dims scipy
    handles original indices directly — the relabel dominated
    hyperdnn's per-layer mxm, r5 profile)."""
    from scipy import sparse

    out_dtype = np.dtype(out_dtype)
    if len(ra) == 0 or len(rb) == 0:
        e = np.empty(0, np.int64)
        return e, e.copy(), np.empty(0, out_dtype)

    engine = config.spgemm_engine

    # diagonal-B fast path: C = A with values mul(a_ij, d_j) on the
    # columns where the diagonal is present — O(nnz) elementwise, no
    # symbolic phase (the hyperdnn bias mxm is exactly this shape; the
    # generic path materialized (E, width) buffers against it)
    mul0 = semiring.mul_op
    if (len(rb) and not mul0.positional
            and bool(np.all(rb == cb))):
        pos = np.searchsorted(rb, ca)
        pos_c = np.minimum(pos, len(rb) - 1)
        hit = rb[pos_c] == ca
        rr, cc = ra[hit], ca[hit]
        av = va[hit]
        dv = vb[pos_c[hit]]
        if mul0.builtin and mul0.op in _NP_DIAG_MULS:
            vals = _NP_DIAG_MULS[mul0.op](
                av.astype(out_dtype), dv.astype(out_dtype))
        else:
            vals = np.asarray(mul0.apply(
                jnp.asarray(av.astype(out_dtype)),
                jnp.asarray(dv.astype(out_dtype))))
        burble("unmasked spgemm (diag-B fast path): %d nnz", len(rr))
        return rr, cc, vals.astype(out_dtype)

    if engine in ("auto", "dense"):
        res = dense_spgemm(ra, ca, va, rb, cb, vb, semiring, out_dtype)
        if res is not None:
            return res
    if engine == "esc" or (engine == "auto" and _on_tpu()):
        from .esc import esc_spgemm

        res = esc_spgemm(ra, ca, va, rb, cb, vb, semiring, out_dtype)
        if res is not None:
            return res

    add = semiring.add_monoid.binaryop
    mul = semiring.mul_op
    plus_family = (add.builtin and add.op == "PLUS" and mul.builtin
                   and not mul.positional and mul.op in _SCIPY_MULS
                   and out_dtype.kind in "fiu")

    # identity "relabel" pays an O(dim) scipy indptr per operand, so it
    # needs dims both int32-safe AND comparable to nnz (hypersparse
    # 2^60-dim matrices still relabel)
    nnz_ab = len(ra) + len(rb)
    if dims is not None and max(dims) < (1 << 31) \
            and max(dims) <= max(1 << 22, 8 * nnz_ab):
        ur = uk = uc = None
        ri, ka, kb, ci = ra, ca, rb, cb
        sm, sk, sn = dims
    else:
        (ur, ri), (uk, ka, kb), (uc, ci) = _relabel(ra, ca, rb, cb)
        sm, sk, sn = len(ur), len(uk), len(uc)
    cnt_dt = np.int64
    Ac = sparse.csr_matrix((np.ones(len(ra), cnt_dt), (ri, ka)),
                           shape=(sm, sk))
    Bc = sparse.csr_matrix((np.ones(len(rb), cnt_dt), (kb, ci)),
                           shape=(sk, sn))
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
                                   shape=(sm, sk))
            Bn = sparse.csr_matrix((bv, (kb, ci)),
                                   shape=(sk, sn))
            Q = An @ Bn
            Q.sort_indices()
            Q = Q.tocoo()
            # scipy prunes exact-zero results; re-fill them as stored
            # zeros against the symbolic pattern
            vals = np.zeros(len(pr), out_dtype)
            if Q.nnz:
                hit = cs.in_sorted(pr, pc, Q.row.astype(np.int64),
                                   Q.col.astype(np.int64),
                                   sorted_queries=True)
                vals[hit] = Q.data.astype(out_dtype)
        burble("unmasked spgemm (scipy %s_%s): %d x %d -> %d nnz",
               add.op, mul.op, len(ra), len(rb), len(pr))
        if ur is None:
            return pr, pc, vals
        return ur[pr], uc[pc], vals

    # general semiring: numeric fill = masked SpGEMM with the symbolic
    # pattern as a structural mask (device bucket-intersect kernels)
    from .spgemm import masked_spgemm
    from .coosparse import build

    out_r, out_c = (pr, pc) if ur is None else (ur[pr], uc[pc])
    bt_r, bt_c, bt_v = build(cb, rb, vb, vb.dtype)   # B transposed
    burble("unmasked spgemm (generic %s_%s): pattern %d entries",
           add.op, mul.op, len(out_r))
    r2, c2, v2 = masked_spgemm(ra, ca, va, bt_r, bt_c, bt_v,
                               out_r, out_c, semiring, out_dtype)
    # masked_spgemm returns only entries with a nonempty intersection,
    # which for the structural pattern is every entry
    return r2, c2, v2
