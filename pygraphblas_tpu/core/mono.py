"""Monotone windowed gather — the TPU-fast path for every "sorted
irregular read" in the sparse stack.

A gather ``out[i] = src[idx[i]]`` with *non-decreasing* ``idx`` has the
property that each 128-element output row reads from a bounded,
monotonically-advancing window of the source.  On this hardware an
arbitrary XLA gather costs ~8 cycles/element, but a dynamic sublane
slice + in-register lane gather costs ~0.005 ns/element (PERF.md), so
each output row s decomposes into:

    window load:  src2d[q0[s] + w]           (dynamic sublane slice)
    lane gather:  take_along_axis(win, dm[s] - 128*w)

with ``q0`` (128-aligned window base) and ``dm`` (lane deltas) static
plan data; rows whose indices span several windows loop over ``w``
(amortized O(1 + src_n/n) windows per row).  Sources larger than VMEM
are streamed: the grid walks output blocks and a scalar-prefetched
index map pulls the two source blocks covering that output's window
span (monotonicity bounds the span).

Modes:
  - plain:  out (S,128) = src[idx], with idx < 0 -> `fill`
  - fused multiply: mul(vals, gathered) (semiring mul closure)
  - fold8:  out (S/8,128) = lanewise fold of each 8-row slot group
            (one 8-ary reduction level; groups are slot-major)

Used by core/xspmv.py for semiring SpMV decode, reduction levels, and
row placement; replaces the role of the reference's SuiteSparse C
gather loops (pygraphblas matrix.py:2716, vector.py:961).
"""

import numpy as np
import jax
import jax.numpy as jnp

# resident-source limit: keep the whole source in VMEM below this
_RESIDENT_BYTES = 11 << 20
_MAX_XB = 8192           # streaming window block rows (8192*128*4B = 4MB)
# Group-span kernel gate: one ds(qg, wva) multi-sublane slice per 8-row
# group replaces per-row (and per-window) single-row slices, which cost
# ~10 cyc each and dominate the per-row kernel (PERF.md round-4).  The
# static unroll bound: groups spanning more source rows than this fall
# back to the per-row kernel.  (Supersedes the round-3 "gw" encoding,
# whose dynamic in-kernel span loop measured a net loss — PERF.md
# "Round-3 gw post-mortem".)
_SPAN_MAX_WVA = 48
_FORCE_INTERPRET = False  # tests: run the pallas kernels in interpret mode
# group loop strategy in the span kernel: python unroll (static slices,
# cross-group ILP) vs fori_loop (serial dependency chains)
import os as _os
_SPAN_UNROLL = _os.environ.get("PYGB_MONO_SPAN_UNROLL", "1") != "0"


def _on_tpu():
    return jax.default_backend() == "tpu"


def _next_pow2(x):
    p = 1
    while p < x:
        p *= 2
    return p


class MonoPlan:
    """Static plan for one monotone gather: idx (N,) non-decreasing into
    a source of logical length src_n.  idx[i] < 0 marks invalid -> fill.

    Registered as a pytree (arrays = leaves) so plans flow through jit
    as device-buffer ARGUMENTS — embedding multi-hundred-MB plans as
    closure constants overflows the remote-compile transport."""

    __slots__ = ("S", "blk", "src_n", "src_rows", "q0", "dm", "max_w",
                 "stream", "xb", "xblk", "xblk_max", "ok",
                 "wva", "qg")

    def _aux(self):
        return (self.S, self.blk, self.src_n, self.src_rows, self.max_w,
                self.stream, self.xb, self.xblk_max, self.ok, self.wva)

    def _children(self):
        return (self.q0, self.dm, self.xblk, self.qg)

    @staticmethod
    def _unflatten(aux, children):
        p = MonoPlan()
        (p.S, p.blk, p.src_n, p.src_rows, p.max_w, p.stream, p.xb,
         p.xblk_max, p.ok, p.wva) = aux
        p.q0, p.dm, p.xblk, p.qg = children
        return p

    @staticmethod
    def build(idx, src_n, itemsize=4):
        idx = np.asarray(idx, np.int64)
        n = len(idx)
        # int32 index pipeline when values fit (always: plans cap at
        # 2^30 cells) — the (S,128)-shaped temporaries below are the
        # build's memory traffic, and halving them is a ~2x build win
        it = np.int32 if src_n < (1 << 31) else np.int64
        idx = idx.astype(it)
        # S multiple of 64: fold-mode output blocks are S/8 rows and the
        # TPU requires block rows divisible by 8
        S = max(64, -(-n // 128))
        S = -(-S // 64) * 64
        pad = S * 128 - n
        if pad:
            idx = np.concatenate([idx, np.full(pad, -1, it)])
        idxm = idx.reshape(S, 128)
        valid = idxm >= 0
        firsts = np.where(valid, idxm, np.iinfo(it).max).min(axis=1)
        # rows with no valid index must not widen the streaming span:
        # carry the previous row's first forward (idx is non-decreasing,
        # so max-accumulate == last valid first) instead of dropping to 0
        firsts = np.where(valid.any(axis=1), firsts, it(-1))
        firsts = np.maximum.accumulate(firsts)
        firsts = np.where(firsts < 0, it(0), firsts)
        q0 = firsts >> 7
        dm64 = np.where(valid, idxm - (q0[:, None] << 7), it(-1))
        # int16 lane deltas when windows are narrow (the common case
        # after rank-space compaction): halves index traffic, which is
        # the same volume as the data itself
        dm = dm64.astype(np.int16) if (n == 0 or dm64.max() < 32767) \
            else dm64.astype(np.int32)

        plan = MonoPlan()
        plan.S = S
        plan.src_n = src_n
        plan.src_rows = -(-src_n // 128)
        plan.dm = jnp.asarray(dm)
        plan.max_w = int(dm.max() // 128 + 1) if n else 1
        plan.ok = True
        plan.wva = 0
        plan.qg = jnp.zeros((S // 8,), jnp.int32)

        blk = 512
        while S % blk:
            blk //= 2
        plan.blk = blk

        if (plan.src_rows + 2) * 128 * itemsize <= _RESIDENT_BYTES:
            plan.stream = False
            plan.q0 = jnp.asarray(q0.astype(np.int32))
            plan.xb = 0
            plan.xblk = jnp.zeros((S // blk,), jnp.int32)
            plan.xblk_max = 0
            # group-span encoding: ONE ds(qg, wva) multi-sublane slice
            # per 8-row group instead of 8*max_w single-row slices (the
            # slices cost ~10 cyc each and dominate — PERF.md round-4).
            # qg = group window base row; dm re-encoded relative to the
            # GROUP base; wva = static unroll bound (max group span).
            qg = q0[0::8]                       # q0 is non-decreasing
            ci = (q0[:, None] - np.repeat(qg, 8)[:, None]) * 128 + dm64
            ci_max = int(np.where(dm64 >= 0, ci, 0).max()) if n else 0
            wva = ci_max // 128 + 1
            if wva <= _SPAN_MAX_WVA:
                plan.wva = wva
                plan.dm = jnp.asarray(
                    np.where(dm64 >= 0, ci, -1).astype(np.int16))
                plan.qg = jnp.asarray(qg.astype(np.int32))
            return plan

        # streaming: per output block, two consecutive source blocks of
        # XB rows must cover every window the block's rows touch
        plan.stream = True
        nblocks = S // blk
        q0b = q0.reshape(nblocks, blk)
        wrows = (dm.max(axis=1) // 128 + 1).reshape(nblocks, blk)
        lo = q0b.min(axis=1)
        hi = (q0b + wrows).max(axis=1)
        xb = _next_pow2(int((hi - (lo // 1) ).max()) + 2)
        # align lo to xb and re-check span fits two blocks
        while True:
            blo = lo // xb
            if int((hi - blo * xb).max()) <= 2 * xb - 1 or xb >= (1 << 30):
                break
            xb *= 2
        if xb > _MAX_XB:
            from ..base import burble

            plan.ok = False   # pathological span: caller falls back
            burble("MonoPlan: streaming span %d > %d rows; falling back "
                   "to the XLA gather path", xb, _MAX_XB)
            xb = _MAX_XB
        plan.xb = xb
        xblk = (lo // xb).astype(np.int64)
        plan.xblk = jnp.asarray(xblk.astype(np.int32))
        plan.xblk_max = int(xblk.max()) if len(xblk) else 0
        plan.q0 = jnp.asarray(
            (q0 - np.repeat(xblk * xb, blk)).astype(np.int32))
        return plan


jax.tree_util.register_pytree_node(
    MonoPlan,
    lambda p: (p._children(), p._aux()),
    MonoPlan._unflatten)


def mono_gather(plan, src, fill, vals=None, mul=None, fold=None):
    """Execute the planned monotone gather (jit-composable).

    src: (>= src_n,) device array, viewed as rows of 128.
    fill: scalar for invalid lanes (monoid identity / zero).
    vals/mul: optional fused product mul(vals, gathered); invalid -> fill.
    fold: optional lanewise fold closure over 8-row slot groups.
    """
    S = plan.S
    dtype = src.dtype
    if (not _on_tpu() and not _FORCE_INTERPRET) or not plan.ok \
            or dtype.itemsize > 4:
        valid = plan.dm >= 0
        if plan.wva:
            # span encoding: dm is relative to the GROUP base row
            base = jnp.repeat(plan.qg.astype(jnp.int64), 8)
        else:
            base = plan.q0.astype(jnp.int64)
            if plan.stream:
                base = base + jnp.repeat(
                    plan.xblk.astype(jnp.int64) * plan.xb, plan.blk)
        idx = base[:, None] * 128 + plan.dm
        g = jnp.take(src, jnp.clip(idx.reshape(-1), 0, src.shape[0] - 1))
        g = g.reshape(S, 128)
        g = jnp.where(valid, g, jnp.asarray(fill, dtype))
        if mul is not None:
            g = jnp.where(valid, mul(vals.reshape(S, 128), g),
                          jnp.asarray(fill, dtype))
        if fold is not None:
            g = g.reshape(S // 8, 8, 128)
            out = g[:, 0, :]
            for k in range(1, 8):
                out = fold(out, g[:, k, :])
            return out
        return g
    if plan.wva:
        return _mono_pallas_span(plan, src, fill, vals, mul, fold)
    return _mono_pallas(plan, src, fill, vals, mul, fold)


def _pad_rows(src, rows):
    n = src.shape[0]
    need = rows * 128
    if n < need:
        src = jnp.concatenate([src, jnp.zeros((need - n,), src.dtype)])
    return src[:need].reshape(rows, 128)


def _mono_pallas_span(plan, src, fill, vals, mul, fold):
    """Group-span kernel (resident sources): ONE ds(qg, wva) multi-
    sublane slice per 8-row group + wva static-unrolled in-register lane
    gathers/selects, instead of 8*max_w single-row slices (~10 cyc
    each).  dm is the in-window element offset relative to the group
    base row (sublane = dm>>7, lane = dm&127; -1 = invalid)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, blk = plan.S, plan.blk
    wva = plan.wva
    dtype = src.dtype
    fill = np.dtype(dtype).type(fill)
    folded = fold is not None
    nsrc_rows = plan.src_rows + wva + 2
    src2 = _pad_rows(src, nsrc_rows)

    def kern(*refs):
        qg_ref, dm_ref, x_ref = refs[:3]
        rest = refs[3:]
        if mul is not None:
            v_ref = rest[0]
            rest = rest[1:]
        out_ref = rest[0]
        gbase = pl.program_id(0).astype(jnp.int32) * (blk // 8)

        def do_group(g, unrolled):
            if not unrolled:
                g = g.astype(jnp.int32)
            s0 = g * 8
            if unrolled:
                dmg = dm_ref[s0:s0 + 8, :].astype(jnp.int32)
            else:
                dmg = dm_ref[pl.ds(s0, 8), :].astype(jnp.int32)
            win = x_ref[pl.ds(qg_ref[gbase + g], wva), :]   # (wva, 128)
            sb = dmg >> 7              # in-window sublane (-1 = invalid)
            ln = jnp.bitwise_and(dmg, 127)
            acc = jnp.full((8, 128), fill, dtype)
            for k in range(wva):
                gsel = jnp.take_along_axis(
                    jnp.broadcast_to(win[k:k + 1, :], (8, 128)), ln,
                    axis=1)
                acc = jnp.where(sb == k, gsel, acc)
            if mul is not None:
                vv = v_ref[s0:s0 + 8, :] if unrolled \
                    else v_ref[pl.ds(s0, 8), :]
                acc = jnp.where(dmg >= 0, mul(vv, acc),
                                jnp.asarray(fill, dtype))
            if folded:
                r = acc[0:1, :]
                for k in range(1, 8):
                    r = fold(r, acc[k:k + 1, :])
                if unrolled:
                    out_ref[g:g + 1, :] = r
                else:
                    out_ref[pl.ds(g, 1), :] = r
            else:
                if unrolled:
                    out_ref[s0:s0 + 8, :] = acc
                else:
                    out_ref[pl.ds(s0, 8), :] = acc
            return 0

        with jax.enable_x64(False):
            if _SPAN_UNROLL:
                for g in range(blk // 8):
                    do_group(g, True)
            else:
                jax.lax.fori_loop(0, blk // 8,
                                  lambda g, c: do_group(g, False), 0)

    out_rows = S // 8 if folded else S
    out_blk = blk // 8 if folded else blk
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                      # qg
        pl.BlockSpec((blk, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),                      # dm
        pl.BlockSpec(memory_space=pltpu.VMEM),                      # src
    ]
    args = [plan.qg, plan.dm, src2]
    if mul is not None:
        in_specs.append(pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(vals.reshape(S, 128))
    with jax.enable_x64(False):  # index maps must trace 32-bit
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((out_rows, 128), dtype),
            grid=(S // blk,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((out_blk, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=_FORCE_INTERPRET,
        )(*args)


def mono_cascade(levels, place, src, fill, fold):
    """Fused reduction cascade: every fold level AND the final row
    placement in ONE Pallas launch, with all intermediates in VMEM
    scratch.

    The per-level mono_gather chain pays a fixed ~0.1 ms of launch/DMA
    setup per level on the real chip while each level's data is tiny
    (the cascade works on <= nnz/8 cells); at 5 levels + placement that
    overhead dominated the whole cascade (PERF.md round-4).  Here the
    levels run back-to-back inside one kernel: level l reads level
    l-1's scratch buffer with the same group-span windows the span
    kernel uses, folds 8 slot rows, and writes its own scratch; the
    placement pass gathers the final single-cell rows into the output.

    Returns the placed (S, 128) array, or None when the fused kernel
    does not apply (CPU backend, 64-bit dtypes, streaming plans, or
    VMEM budget) — callers fall back to the per-level chain.
    """
    if not levels:
        return None
    if not _on_tpu() and not _FORCE_INTERPRET:
        return None
    dtype = src.dtype
    if dtype.itemsize > 4:
        return None
    plans = list(levels) + [place]
    for p in plans:
        if (not p.ok) or p.stream or p.wva == 0:
            return None
    isz = dtype.itemsize
    # scratch buffer l holds level l's folded output plus the pad rows
    # the NEXT plan's window slices may overrun into
    scratch_rows = []
    budget = (levels[0].src_rows + levels[0].wva + 2) * 128 * isz
    for l, p in enumerate(levels):
        out_rows = p.S // 8
        scratch_rows.append(out_rows + plans[l + 1].wva + 2)
        budget += scratch_rows[-1] * 128 * isz
    for p in plans:
        budget += p.dm.size * p.dm.dtype.itemsize + p.qg.size * 4
    budget += place.S * 128 * isz
    if budget > (90 << 20):
        return None

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = len(levels)
    fillv = np.dtype(dtype).type(fill)
    src2 = _pad_rows(src, levels[0].src_rows + levels[0].wva + 2)

    def kern(*refs):
        qgs = refs[:L + 1]
        dms = refs[L + 1:2 * (L + 1)]
        x_ref = refs[2 * (L + 1)]
        out_ref = refs[2 * (L + 1) + 1]
        scr = refs[2 * (L + 1) + 2:]

        def run_level(l, src_ref, dst_ref, folded):
            qg_ref, dm_ref = qgs[l], dms[l]
            wva = plans[l].wva
            n_groups = plans[l].S // 8
            # 8 groups per loop step, statically unrolled: a serial
            # one-group-per-step fori_loop is a dependency chain the VPU
            # can't pipeline (same reason _SPAN_UNROLL defaults on)
            U = 8

            def do_group(g, u, c):
                g = g.astype(jnp.int32) * U + u
                s0 = g * 8
                dmg = dm_ref[pl.ds(s0, 8), :].astype(jnp.int32)
                win = src_ref[pl.ds(qg_ref[g], wva), :]
                sb = dmg >> 7
                ln = jnp.bitwise_and(dmg, 127)
                acc = jnp.full((8, 128), fillv, dtype)
                for k in range(wva):
                    gsel = jnp.take_along_axis(
                        jnp.broadcast_to(win[k:k + 1, :], (8, 128)), ln,
                        axis=1)
                    acc = jnp.where(sb == k, gsel, acc)
                if folded:
                    r = acc[0:1, :]
                    for k in range(1, 8):
                        r = fold(r, acc[k:k + 1, :])
                    dst_ref[pl.ds(g, 1), :] = r
                else:
                    dst_ref[pl.ds(s0, 8), :] = acc
                return c

            def do_chunk(i, c):
                for u in range(U):
                    do_group(i, u, c)
                return c

            jax.lax.fori_loop(0, n_groups // U, do_chunk, 0)

        with jax.enable_x64(False):
            for l in range(L):
                # zero the window-overrun pad tail before the next plan
                # reads it (scratch memory is uninitialized)
                pad0 = plans[l].S // 8
                scr[l][pl.ds(pad0, scratch_rows[l] - pad0), :] = jnp.full(
                    (scratch_rows[l] - pad0, 128), fillv, dtype)
                run_level(l, x_ref if l == 0 else scr[l - 1], scr[l], True)
            run_level(L, scr[L - 1], out_ref, False)

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in plans]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in plans]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)])
    args = [p.qg for p in plans] + [p.dm for p in plans] + [src2]
    with jax.enable_x64(False):  # index maps / shapes trace 32-bit
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((place.S, 128), dtype),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((r, 128), dtype)
                            for r in scratch_rows],
            # the whole cascade is deliberately VMEM-resident; the
            # default 16 MB scoped-vmem budget is for tiled kernels
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20),
            interpret=_FORCE_INTERPRET,
        )(*args)


def _mono_pallas(plan, src, fill, vals, mul, fold):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, blk = plan.S, plan.blk
    dtype = src.dtype
    fill = np.dtype(dtype).type(fill)
    folded = fold is not None
    stream = plan.stream
    xb = plan.xb

    if stream:
        nsrc_rows = (plan.xblk_max + 2) * xb
    else:
        nsrc_rows = plan.src_rows + plan.max_w + 1
    src2 = _pad_rows(src, nsrc_rows)

    # unroll the window loop when the worst row needs few windows
    # (dynamic-bound fori per 8-row group costs more than the windows)
    unroll = plan.max_w <= 16

    def body_group(q0_ref, dmg, x0, x1, s0):
        # all in-kernel index arithmetic pinned to int32: the package
        # enables jax x64, and Mosaic cannot lower 64-bit vectors

        def body(w, acc):
            w = w.astype(jnp.int32) if hasattr(w, "astype") else w
            rows = []
            for r in range(8):
                q = q0_ref[s0 + r] + w
                if stream:
                    r0 = x0[pl.ds(jnp.minimum(q, xb - 1), 1), :]
                    r1 = x1[pl.ds(jnp.clip(q - xb, 0, xb - 1), 1), :]
                    rows.append(jnp.where(q < xb, r0, r1))
                else:
                    rows.append(x0[pl.ds(q, 1), :])
            win = jnp.concatenate(rows, axis=0)
            lm = dmg - w * 128
            okm = jnp.logical_and(lm >= 0, lm < 128)
            gth = jnp.take_along_axis(win, jnp.bitwise_and(lm, 127), axis=1)
            return jnp.where(okm, gth, acc)

        acc = jnp.full((8, 128), fill, dtype)
        if unroll:
            for w in range(plan.max_w):
                acc = body(w, acc)
            return acc
        maxw = (1 + jnp.max(dmg) // 128).astype(jnp.int32)
        return jax.lax.fori_loop(0, maxw, body, acc)

    def kern(*refs):
        if stream:
            _, q0_ref, dm_ref, x0_ref, x1_ref = refs[:5]
            rest = refs[5:]
        else:
            q0_ref, dm_ref, x0_ref = refs[:3]
            x1_ref = x0_ref
            rest = refs[3:]
        if mul is not None:
            v_ref = rest[0]
            rest = rest[1:]
        out_ref = rest[0]
        # q0 is the whole (un-blocked) SMEM array: index it globally
        q0_base = pl.program_id(0).astype(jnp.int32) * blk

        def do_group(g, _):
            g = g.astype(jnp.int32)
            s0 = g * 8
            dmg = dm_ref[pl.ds(s0, 8), :].astype(jnp.int32)
            acc = body_group(q0_ref, dmg, x0_ref, x1_ref, q0_base + s0)
            if mul is not None:
                acc = jnp.where(dmg >= 0, mul(v_ref[pl.ds(s0, 8), :], acc),
                                jnp.asarray(fill, dtype))
            if folded:
                r = acc[0:1, :]
                for k in range(1, 8):
                    r = fold(r, acc[k:k + 1, :])
                out_ref[pl.ds(g, 1), :] = r
            else:
                out_ref[pl.ds(s0, 8), :] = acc
            return 0

        # trace the kernel with 32-bit defaults: Mosaic cannot lower the
        # 64-bit vectors that jnp index helpers emit under jax_enable_x64
        with jax.enable_x64(False):
            jax.lax.fori_loop(0, blk // 8, do_group, 0)

    out_rows = S // 8 if folded else S
    out_blk = blk // 8 if folded else blk
    out_spec = pl.BlockSpec((out_blk, 128), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((out_rows, 128), dtype)
    q0_d = plan.q0
    dm_d = plan.dm

    if stream:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),                # q0
            pl.BlockSpec((blk, 128), lambda i, xbr: (i, 0),
                         memory_space=pltpu.VMEM),                # dm
            pl.BlockSpec((xb, 128), lambda i, xbr: (xbr[i], 0),
                         memory_space=pltpu.VMEM),                # src blk 0
            pl.BlockSpec((xb, 128), lambda i, xbr: (xbr[i] + 1, 0),
                         memory_space=pltpu.VMEM),                # src blk 1
        ]
        args = [q0_d, dm_d, src2, src2]
        if mul is not None:
            in_specs.append(pl.BlockSpec((blk, 128), lambda i, xbr: (i, 0),
                                         memory_space=pltpu.VMEM))
            args.append(vals.reshape(S, 128))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S // blk,),
            in_specs=in_specs,
            out_specs=out_spec,
        )
        with jax.enable_x64(False):  # index maps must trace 32-bit
            return pl.pallas_call(kern, out_shape=out_shape,
                                  grid_spec=grid_spec,
                                  interpret=_FORCE_INTERPRET)(
                plan.xblk, *args)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((blk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [q0_d, dm_d, src2]
    if mul is not None:
        in_specs.append(pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(vals.reshape(S, 128))
    with jax.enable_x64(False):  # index maps must trace 32-bit
        return pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(S // blk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_blk, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_FORCE_INTERPRET,
    )(*args)
