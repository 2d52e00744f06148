"""Segmented inclusive fold-scan on TPU.

Computes, for a flat value stream partitioned into segments by start
flags, the running monoid fold within each segment.  Standalone
primitive for cumulative ops and select/compaction; it was benchmarked
as the xspmv row reduce and LOST to the log8 fold cascade (1.256G vs
1.356G nnz/s — the serial carry chain stalls where the cascade's folds
are dependency-free, see PERF.md), so xspmv keeps the cascade and this
module stays a utility, not an integration.

XLA's ``lax.associative_scan`` lowers to odd/even strided slices that
cost more than the data movement on this hardware (measured 9.7 ms for
2.3M elements — PERF.md); this kernel is the classic Hillis-Steele form
in registers:

  per (8,128) tile:   7 lane-roll combine steps (within sublane rows),
                      unrolled 8-row carry chain, incoming-carry apply
  across tiles:       sequential fori carry within a grid block
  across grid blocks: (1,1) SMEM scratch carries (TPU grids execute
                      sequentially on a core)

The segmented combine  (va,ba) . (vb,bb) = (bb ? vb : fold(va,vb), ba|bb)
is associative, so any prefix regrouping is sound.
"""

import numpy as np
import jax
import jax.numpy as jnp


def _on_tpu():
    return jax.default_backend() == "tpu"


def segfold_scan(values, flags, fold, ident):
    """Inclusive segmented scan of `values` (M,) with segment-start
    `flags` (M,) bool; returns the scanned values (M,).  M % 1024 == 0.
    Jit-composable."""
    m = values.shape[0]
    assert m % 1024 == 0, "segfold_scan needs a 1024-multiple length"

    def segop(a, b):
        va, ba = a
        vb, bb = b
        return jnp.where(bb, vb, fold(va, vb)), jnp.logical_or(ba, bb)

    if not _on_tpu():
        out, _ = jax.lax.associative_scan(segop, (values, flags))
        return out
    return _segfold_pallas(values, flags, fold, ident)


def _segfold_pallas(values, flags, fold, ident):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = values.shape[0]
    dtype = values.dtype
    ident = np.dtype(dtype).type(ident)
    rows = m // 128
    blk = 512
    while rows % blk:
        blk //= 2
    v2 = values.reshape(rows, 128)
    f2 = flags.reshape(rows, 128).astype(jnp.int32)

    # flags travel as int32 vectors (Mosaic rolls are 32-bit only)
    def combine(lv, lb, rv, rb):
        return jnp.where(rb != 0, rv, fold(lv, rv)), jnp.maximum(lb, rb)

    def kern(v_ref, f_ref, o_ref, cv_ref, cb_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        @pl.when(pl.program_id(0) == 0)
        def _():
            cv_ref[0, 0] = jnp.asarray(ident, dtype)
            cb_ref[0, 0] = jnp.int32(0)

        zero8 = jnp.zeros((8, 128), jnp.int32)

        def tile(t, carry):
            c_v, c_b = carry
            s0 = t * 8
            v = v_ref[pl.ds(s0, 8), :]
            b = f_ref[pl.ds(s0, 8), :]
            # lane scan within each sublane row
            for k in (1, 2, 4, 8, 16, 32, 64):
                sv = pltpu.roll(v, k, axis=1)
                sb = pltpu.roll(b, k, axis=1)
                ok = lane >= k
                lv = jnp.where(ok, sv, jnp.asarray(ident, dtype))
                lb = jnp.where(ok, sb, jnp.int32(0))
                v, b = combine(lv, lb, v, b)
            # row carries: exclusive chain over the 8 row totals
            acc_v = jnp.full((1, 128), ident, dtype)
            acc_b = jnp.zeros((1, 128), jnp.int32)
            rows_v = []
            rows_b = []
            for s in range(8):
                rows_v.append(acc_v)
                rows_b.append(acc_b)
                if s < 7:
                    acc_v, acc_b = combine(acc_v, acc_b,
                                           v[s:s + 1, 127:128],
                                           b[s:s + 1, 127:128])
            rv = jnp.concatenate(rows_v, axis=0)
            rb = jnp.concatenate(rows_b, axis=0)
            v, b = combine(rv, rb, v, b)
            # incoming carry applies to the whole tile
            v, b = combine(jnp.full((8, 128), c_v, dtype),
                           zero8 + c_b, v, b)
            o_ref[pl.ds(s0, 8), :] = v
            return v[7, 127], b[7, 127]

        c0 = (cv_ref[0, 0], cb_ref[0, 0])
        with jax.enable_x64(False):
            cv, cb = jax.lax.fori_loop(0, blk // 8, tile, c0)
        cv_ref[0, 0] = cv
        cb_ref[0, 0] = cb

    with jax.enable_x64(False):  # Mosaic has no 64-bit vectors
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((rows, 128), dtype),
            grid=(rows // blk,),
            in_specs=[pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((1, 1), dtype),
                            pltpu.SMEM((1, 1), jnp.int32)],
        )(v2, f2)
    return out.reshape(m)
