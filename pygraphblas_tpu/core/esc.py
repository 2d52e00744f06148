"""Device-resident unmasked SpGEMM: expand / sort / compact (ESC).

C = A (+.x) B with no mask bounding the output pattern.  The reference
hands this to SuiteSparse's Gustavson/hash C kernels
(``pygraphblas/matrix.py:2574``); the TPU formulation here maps every
phase onto primitives this hardware is actually fast at:

1. **Expansion** (size F = Σ_e deg_B(k_e), the FLOP count): A's entries
   are sorted by inner index k; every entry expands to its B row
   segment.  The per-slot source positions are generated ON DEVICE by
   PLUS-segmented scans (core/scan.py Pallas kernel — seeds at run
   starts, +1 increments inside runs), so no F-sized index plan is ever
   built on the host or shipped through the interconnect.  Host work is
   O(nnz) relabeling only.
2. **Gather**: B columns and values are fetched at the scanned
   positions with a dual-source group-window Pallas kernel (one dynamic
   sublane slice per 8-row group + in-register lane gathers — the
   core/mono.py layout), not the ~8-cycle/element XLA gather.
3. **Sort**: one ``jax.lax.sort`` of (key = row*Nc + col, product)
   pairs — XLA's bitonic network is the only log-depth primitive on
   this chip, and it replaces the reference's per-row hash tables.
4. **Reduce + compact**: segment totals via the segmented fold-scan;
   segment-end positions are pulled as a packed bitmap (F/8 bytes) and
   compacted with one device take.

Structural semantics match GraphBLAS exactly: every structural match
produces an output entry, even when the value reduces to zero (the
scipy path needs an explicit re-fill for this; here it is free).

Falls back (returns None) when: value/output dtypes are not 4-byte
(Mosaic has no 64-bit vectors), the mul is positional, B's segments
exceed VMEM residency, a B row is heavier than the group-window span
cap, or F exceeds the sort budget.  Callers then use the host
two-phase path (core/gustavson.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

from functools import partial

from ..base import burble
from .scan import segfold_scan

# group-window span cap (source rows per 1024-slot group); the Pallas
# kernel loops span times per group, so this bounds worst-case work
_SPAN_CAP = 120
# B source arrays must be VMEM-resident for the window kernel
_B_RESIDENT = 5 << 20
# F (padded) budget: sort scratch is the HBM high-water mark
MAX_F = 1 << 27


def _on_tpu():
    return jax.default_backend() == "tpu"


def _next_pow2(x):
    p = 1024
    while p < x:
        p *= 2
    return p


def esc_supported(semiring, out_dtype, va_dtype, vb_dtype):
    """Static (pre-plan) support check for the ESC engine."""
    mul = semiring.mul_op
    add = semiring.add_monoid
    if mul.positional:
        return False
    try:
        add.identity(np.dtype(out_dtype) if np.dtype(out_dtype) != np.bool_
                     else np.int32)
    except Exception:
        return False
    if _on_tpu():
        for dt in (out_dtype, va_dtype, vb_dtype):
            dt = np.dtype(dt)
            if dt != np.bool_ and dt.itemsize > 4:
                return False
    return True


def _esc_gw_gather(cols2d, vals2d, qg, span, dm, span_max):
    """Dual-source group-window gather: out[s] = src[bpos[s]] for both
    B-columns and B-values, with bpos encoded as (qg per 8-row group,
    dm = bpos - 128*qg).  One dynamic sublane slice per (group, window
    step) serves both sources."""
    S = dm.shape[0]
    vdt = vals2d.dtype
    if not _on_tpu():
        idx = (jnp.repeat(qg.astype(jnp.int64), 8)[:, None] * 128
               + dm.astype(jnp.int64))
        flat = jnp.clip(idx.reshape(-1), 0, cols2d.size - 1)
        return (jnp.take(cols2d.reshape(-1), flat).reshape(S, 128),
                jnp.take(vals2d.reshape(-1), flat).reshape(S, 128))

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    blk = 512
    while S % blk:
        blk //= 2
    rows_src = cols2d.shape[0]
    unroll = max(1, min(span_max, 2))

    def kern(qg_ref, sp_ref, dm_ref, c_ref, v_ref, oc_ref, ov_ref):
        gbase = pl.program_id(0).astype(jnp.int32) * (blk // 8)

        def do_group(g, _):
            g = g.astype(jnp.int32)
            s0 = g * 8
            dmg = dm_ref[pl.ds(s0, 8), :]
            qgv = qg_ref[gbase + g]
            sb = dmg >> 7
            ln = jnp.bitwise_and(dmg, 127)

            def step(s, carry):
                ac, av_ = carry
                q = jax.lax.clamp(0, qgv + s, rows_src - 1)
                rc = c_ref[pl.ds(q, 1), :]
                rv = v_ref[pl.ds(q, 1), :]
                gc = jnp.take_along_axis(
                    jnp.broadcast_to(rc, (8, 128)), ln, axis=1)
                gv = jnp.take_along_axis(
                    jnp.broadcast_to(rv, (8, 128)), ln, axis=1)
                hit = sb == s
                return (jnp.where(hit, gc, ac), jnp.where(hit, gv, av_))

            acc = (jnp.zeros((8, 128), jnp.int32),
                   jnp.zeros((8, 128), vdt))
            for s in range(unroll):
                acc = step(s, acc)
            if span_max > unroll:
                spv = sp_ref[gbase + g]
                acc = jax.lax.fori_loop(
                    unroll, spv, lambda s, a: step(s.astype(jnp.int32), a),
                    acc)
            oc_ref[pl.ds(s0, 8), :] = acc[0]
            ov_ref[pl.ds(s0, 8), :] = acc[1]
            return 0

        with jax.enable_x64(False):
            jax.lax.fori_loop(0, blk // 8, do_group, 0)

    with jax.enable_x64(False):  # index maps must trace 32-bit
        return pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((S, 128), jnp.int32),
                       jax.ShapeDtypeStruct((S, 128), vdt)),
            grid=(S // blk,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)),
        )(qg, span, dm, cols2d, vals2d)


@partial(jax.jit, static_argnames=("semiring", "vdt", "F_pad",
                                   "span_max", "narrow"))
def _esc_device(ptr, sb_e, ri_e, va_e, cols2d, vals2d, f_n, nc_n,
                semiring, vdt, F_pad, span_max, narrow):
    """The fused device pipeline: scans -> gather -> products -> sort ->
    segment fold -> packed segment-end bitmap.

    Dynamic sizes (true F, nc) ride as traced scalars; the static shape
    key is (F_pad, nnzA_pad, rows_b) — all pow2-menu'd by the caller so
    executables are reused across calls."""
    vdt = np.dtype(vdt)
    add = semiring.add_monoid
    mul = semiring.mul_op

    flags = jnp.zeros(F_pad, jnp.bool_).at[ptr].set(True)
    stepb = jnp.ones(F_pad, jnp.int32).at[ptr].set(sb_e)
    riv = jnp.zeros(F_pad, jnp.int32).at[ptr].set(ri_e)
    avv = jnp.zeros(F_pad, vdt).at[ptr].set(va_e)

    bpos = segfold_scan(stepb, flags, lambda a, b: a + b, 0)
    ri = segfold_scan(riv, flags, lambda a, b: a + b, 0)
    av = segfold_scan(avv, flags, lambda a, b: a + b,
                      np.dtype(vdt).type(0))

    live = jnp.arange(F_pad, dtype=jnp.int32) < f_n
    bpos = jnp.where(live, bpos, 0)
    # group-window encoding of the gather (device-derived plan)
    b2 = bpos.reshape(-1, 1024)
    qg = (b2.min(axis=1) >> 7).astype(jnp.int32)
    span = ((b2.max(axis=1) >> 7) - qg + 1).astype(jnp.int32)
    dm = (bpos - jnp.repeat(qg, 1024) * 128).reshape(-1, 128)

    ci, bv = _esc_gw_gather(cols2d, vals2d, qg, span, dm, span_max)
    ci = ci.reshape(F_pad)
    bv = bv.reshape(F_pad)

    prod = mul.apply(av, bv).astype(vdt)
    if narrow:
        key = ri * nc_n.astype(jnp.int32) + ci
        sent = jnp.int32(2**31 - 1)
    else:
        key = (ri.astype(jnp.int64) * nc_n.astype(jnp.int64)
               + ci.astype(jnp.int64))
        sent = jnp.int64(2**62)
    key = jnp.where(live, key, sent)

    key_s, prod_s = jax.lax.sort((key, prod), dimension=0, num_keys=1)

    boundary = jnp.concatenate(
        [jnp.ones(1, jnp.bool_), key_s[1:] != key_s[:-1]])
    addf = lambda a, b: add.binaryop.apply(a, b).astype(a.dtype)
    tot = segfold_scan(prod_s, boundary, addf,
                       np.dtype(vdt).type(add.identity(np.dtype(vdt))))
    last = jnp.concatenate([boundary[1:], jnp.ones(1, jnp.bool_)])
    # drop the sentinel run's end marker so pads produce no output
    last = jnp.logical_and(last, key_s != sent)
    packed = jnp.sum(
        last.reshape(-1, 32).astype(jnp.uint32)
        << jnp.arange(32, dtype=jnp.uint32)[None, :], axis=1,
        dtype=jnp.uint32)
    return key_s, tot, packed


def esc_spgemm(ra, ca, va, rb, cb, vb, semiring, out_dtype):
    """C = A (+.x) B unmasked, canonical COO in/out.  Returns
    (rows, cols, vals) or None when unsupported (caller falls back)."""
    out_dtype = np.dtype(out_dtype)
    vdt = np.int32 if out_dtype == np.bool_ else out_dtype
    if not esc_supported(semiring, vdt, va.dtype, vb.dtype):
        return None
    if len(ra) == 0 or len(rb) == 0:
        e = np.empty(0, np.int64)
        return e, e.copy(), np.empty(0, out_dtype)

    from .gustavson import _relabel

    (ur, ri), (uk, ka, kb), (uc, ci) = _relabel(ra, ca, rb, cb)

    # restrict B to inner indices that A actually uses, so scanned
    # window positions advance only over useful segments
    used = np.unique(ka)
    keep = np.isin(kb, used)
    kb2 = kb[keep]
    ci2 = ci[keep].astype(np.int64)
    vb2 = vb[keep]
    if len(kb2) == 0:
        e = np.empty(0, np.int64)
        return e, e.copy(), np.empty(0, out_dtype)
    ku = np.searchsorted(used, kb2)          # compact used-k ids, sorted
    db = np.bincount(ku, minlength=len(used)).astype(np.int64)
    sb = np.concatenate([[0], np.cumsum(db)])[:-1]

    # A entries in inner-index order; drop entries with empty B rows
    order = np.argsort(ka, kind="stable")
    ke = np.searchsorted(used, ka[order])
    d_e = db[ke]
    nz = d_e > 0
    ri_s = ri[order][nz].astype(np.int64)
    va_s = va[order][nz]
    sb_e = sb[ke[nz]]
    d_e = d_e[nz]
    if len(d_e) == 0:
        e = np.empty(0, np.int64)
        return e, e.copy(), np.empty(0, out_dtype)

    F = int(d_e.sum())
    F_pad = _next_pow2(F)
    d_max = int(d_e.max())
    span_max = -(-((1024 + d_max) // 128 + 2) // 16) * 16  # quantized
    rows_b = -(-len(kb2) // 128) + span_max + 2
    if (F_pad > MAX_F or span_max > _SPAN_CAP + 8
            or (_on_tpu() and rows_b * 128 * 4 > _B_RESIDENT)):
        burble("esc_spgemm: falling back (F=%d span=%d nnzB=%d)",
               F, span_max, len(kb2))
        return None

    ptr = np.concatenate([[0], np.cumsum(d_e)])[:-1]
    mc, nc = len(ur), len(uc)
    narrow = mc * nc < 2**31 and F_pad < 2**31

    # pow2-pad every shape so executables cache across calls: pad ptr
    # entries point out of bounds (scatter drops them), pad B rows are
    # zeros the window kernel may read but never keeps
    na_pad = _next_pow2(len(ri_s))
    rows_b = _next_pow2(rows_b)

    def _pad1(arr, dt, fill=0):
        out = np.full(na_pad, fill, dt)
        out[:len(arr)] = arr
        return jnp.asarray(out)

    def _rows2d(arr, dt):
        out = np.zeros(rows_b * 128, dt)
        out[:len(arr)] = arr
        return jnp.asarray(out.reshape(rows_b, 128))

    burble("esc_spgemm: F=%d (pad %d) nnzA=%d nnzB=%d out space %dx%d",
           F, F_pad, len(ri_s), len(kb2), mc, nc)
    key_s, tot, packed = _esc_device(
        _pad1(ptr, np.int32, fill=F_pad),
        _pad1(sb_e, np.int32),
        _pad1(ri_s, np.int32),
        _pad1(np.asarray(va_s).astype(vdt), vdt),
        _rows2d(ci2, np.int32), _rows2d(vb2.astype(vdt), vdt),
        jnp.int32(F), jnp.int64(nc),
        semiring, np.dtype(vdt).name, F_pad, span_max, narrow)

    bits = np.asarray(packed)
    ends = np.nonzero(
        np.unpackbits(bits.view(np.uint8), bitorder="little"))[0]
    if len(ends) == 0:
        e = np.empty(0, np.int64)
        return e, e.copy(), np.empty(0, out_dtype)
    pos = jnp.asarray(ends.astype(np.int64))
    out_key = np.asarray(jnp.take(key_s, pos)).astype(np.int64)
    out_val = np.asarray(jnp.take(tot, pos))
    rr = out_key // nc
    cc = out_key - rr * nc
    return (ur[rr], uc[cc],
            out_val.astype(out_dtype) if out_dtype != np.bool_
            else (out_val != 0))
