"""Degree-binned ELL ("sliced-ELL") sparse format and SpMV kernel.

TPU-first SpMV design: scatter-adds (what ``jax.ops.segment_sum`` lowers
to) are the slow path on TPU, while gathers and dense axis-reductions are
fast.  So rows are binned by degree into power-of-two width classes; each
bin stores its column indices and values as a dense (rows_in_bin, width)
matrix.  A semiring SpMV is then, per bin:

    part = add-reduce_axis1( mul(vals, x[cols]) )        # gather + VPU

followed by ONE small per-virtual-row segment-reduce of length ~nrows
(heavy rows above the width cap are split into adjacent virtual rows) —
16x less scatter work than edge-wise segment_sum at edgefactor 16.

This is the merge/row-balanced formulation of the design brief
(BASELINE.json north star) expressed in XLA's preferred operations.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# widths: powers of two from 1 up to the cap; heavier rows are split
MAX_WIDTH = 4096


class EllFormat:
    """Host-built, device-resident degree-binned ELL arrays."""

    __slots__ = ("widths", "cols", "vals", "valid_counts", "vrow_rows",
                 "n_vrows", "nrows", "nnz")

    def __init__(self, rows, cols, vals, nrows):
        """Build from canonical (row-sorted) COO triples on the host."""
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        self.nrows = nrows
        self.nnz = len(rows)

        # per-row degree and edge offsets (rows are sorted)
        urows, starts, degs = np.unique(rows, return_index=True,
                                        return_counts=True)

        # split heavy rows into virtual rows of <= MAX_WIDTH edges
        # (vectorized: one virtual row per MAX_WIDTH-span of a row)
        n_splits = np.maximum(1, -(-degs // MAX_WIDTH))
        total_v = int(n_splits.sum())
        vrow_row = np.repeat(urows, n_splits)
        base = np.repeat(starts, n_splits)
        grp_end = np.cumsum(n_splits)
        grp_begin = grp_end - n_splits
        within = np.arange(total_v) - np.repeat(grp_begin, n_splits)
        vrow_start = base + within * MAX_WIDTH
        vrow_deg = np.minimum(np.repeat(degs, n_splits)
                              - within * MAX_WIDTH, MAX_WIDTH)

        # bucket virtual rows by next-pow2 width
        width_of = np.maximum(1, 2 ** np.ceil(np.log2(
            np.maximum(vrow_deg, 1))).astype(np.int64))

        idt = np.int32 if nrows < 2**31 else np.int64
        self.widths = []
        self.cols = []
        self.vals = []
        self.valid_counts = []
        order = []  # virtual-row order as emitted per bucket
        for w in sorted(set(width_of.tolist())):
            sel = np.nonzero(width_of == w)[0]
            cnt = vrow_deg[sel].astype(np.int32)
            # vectorized fill: gather a (nb, w) window from the edge arrays
            idx = vrow_start[sel][:, None] + np.arange(w)[None, :]
            lane_valid = np.arange(w)[None, :] < cnt[:, None]
            idx = np.minimum(idx, len(cols) - 1)
            cm = np.where(lane_valid, cols[idx], 0).astype(idt)
            vm = np.where(lane_valid, vals[idx], np.zeros((), vals.dtype))
            self.widths.append(int(w))
            self.cols.append(jnp.asarray(cm))
            self.vals.append(jnp.asarray(vm))
            self.valid_counts.append(jnp.asarray(cnt))
            order.append(sel)

        order = np.concatenate(order) if order else np.zeros(0, np.int64)
        # virtual rows emitted per-bucket; map each emitted part to its row
        emitted_rows = vrow_row[order] if order.size else order
        self.vrow_rows = jnp.asarray(emitted_rows.astype(idt))
        self.n_vrows = int(order.size)


_ELL_ADDS = {
    "PLUS": (jnp.sum, 0.0, jax.ops.segment_sum),
    "MIN": (jnp.min, None, jax.ops.segment_min),
    "MAX": (jnp.max, None, jax.ops.segment_max),
    "TIMES": (jnp.prod, 1.0, jax.ops.segment_prod),
    "LOR": (None, None, None),
    "LAND": (None, None, None),
    "ANY": (None, None, None),
}


def ell_supported(semiring):
    add_op = semiring.add_monoid.binaryop
    mul = semiring.mul_op
    return (add_op.builtin and mul.builtin
            and add_op.op in ("PLUS", "MIN", "MAX", "TIMES", "LOR", "LAND",
                              "ANY")
            and not mul.positional)


@partial(jax.jit, static_argnames=("semiring", "out_dtype", "out_size",
                                   "widths", "n_vrows"))
def _ell_spmv(cols_list, vals_list, cnt_list, vrow_rows, x_vals, x_mask,
              semiring, out_dtype, out_size, widths, n_vrows):
    out_dtype = np.dtype(out_dtype)
    add = semiring.add_monoid.binaryop.op
    mul = semiring.mul_op
    ident = jnp.asarray(semiring.add_monoid.identity(out_dtype))

    bool_add = add in ("LOR", "LAND", "ANY")
    parts = []
    cnts = []
    for w, cm, vm, cnt in zip(widths, cols_list, vals_list, cnt_list):
        lane = jax.lax.broadcasted_iota(jnp.int32, cm.shape, 1)
        pad_valid = lane < cnt[:, None]
        xg = x_vals[cm]
        xp = x_mask[cm]
        valid = jnp.logical_and(pad_valid, xp)
        prod = mul.apply(vm.astype(out_dtype), xg.astype(out_dtype))
        if bool_add:
            pb = jnp.logical_and(valid, prod != 0 if prod.dtype != jnp.bool_
                                 else prod)
            if add in ("LOR", "ANY"):
                part = jnp.any(pb, axis=1)
            else:
                part = jnp.all(jnp.where(valid, pb, True), axis=1)
            part = part.astype(out_dtype)
        elif add == "PLUS":
            part = jnp.sum(jnp.where(valid, prod, jnp.zeros((), out_dtype)),
                           axis=1)
        elif add == "MIN":
            part = jnp.min(jnp.where(valid, prod, ident), axis=1)
        elif add == "MAX":
            part = jnp.max(jnp.where(valid, prod, ident), axis=1)
        else:  # TIMES
            part = jnp.prod(jnp.where(valid, prod, ident), axis=1)
        parts.append(part)
        cnts.append(jnp.sum(valid.astype(jnp.int32), axis=1))

    if not parts:
        return (jnp.zeros((out_size,), out_dtype),
                jnp.zeros((out_size,), jnp.bool_))

    all_parts = jnp.concatenate(parts)
    all_cnts = jnp.concatenate(cnts)

    # virtual-row -> row combine (small: ~nrows elements)
    if add in ("PLUS",):
        y = jax.ops.segment_sum(
            jnp.where(all_cnts > 0, all_parts, jnp.zeros((), out_dtype)),
            vrow_rows, out_size)
    elif add in ("LOR", "ANY"):
        y = jax.ops.segment_max(
            jnp.where(all_cnts > 0, all_parts, jnp.zeros((), out_dtype))
            .astype(jnp.int8), vrow_rows, out_size).astype(out_dtype)
    elif add == "LAND":
        y = jax.ops.segment_min(
            jnp.where(all_cnts > 0, all_parts, jnp.ones((), out_dtype))
            .astype(jnp.int8), vrow_rows, out_size).astype(out_dtype)
    elif add == "MIN":
        y = jax.ops.segment_min(jnp.where(all_cnts > 0, all_parts, ident),
                                vrow_rows, out_size)
    elif add == "MAX":
        y = jax.ops.segment_max(jnp.where(all_cnts > 0, all_parts, ident),
                                vrow_rows, out_size)
    else:  # TIMES
        y = jax.ops.segment_prod(jnp.where(all_cnts > 0, all_parts, ident),
                                 vrow_rows, out_size)
    total = jax.ops.segment_sum(all_cnts, vrow_rows, out_size)
    y_mask = total > 0
    if np.dtype(out_dtype) == np.bool_:
        y = y != 0
    y = jnp.where(y_mask, y.astype(out_dtype), jnp.zeros((), out_dtype))
    return y, y_mask


def ell_spmv(ell, x_vals, x_mask, semiring, out_dtype, out_size):
    return _ell_spmv(tuple(ell.cols), tuple(ell.vals),
                     tuple(ell.valid_counts), ell.vrow_rows, x_vals, x_mask,
                     semiring, np.dtype(out_dtype), out_size,
                     tuple(ell.widths), ell.n_vrows)
