"""Slot-major 8-aligned CSR with a scatter-free hierarchical reduction.

TPU-first SpMV, designed from measured hardware behavior: gathers run at
~8 Gelem/s inside compiled loops while scatter-adds (segment_sum) and
large cumsums run at ~0.1 Gelem/s.  So the row reduction is restructured
to use ONLY gathers and dense axis-0 sums:

- Each row's edges are padded to a multiple of 8 and laid out
  *slot-major*: slot s of row-block b lives at position ``s*m + b``, so
  a (8, m) reshape puts slots on the sublane axis and the per-block sum
  is a cheap axis-0 reduction.
- Per-row block runs are then combined by a static *reduction plan*: a
  pyramid of gather layers (each gathers 8 child partials per block,
  slot-major again) until every row is a single value; empty slots point
  at a reserved identity cell.  Plan depth is log8(max degree).

One plan serves any builtin commutative monoid (PLUS/MIN/MAX/TIMES/
LOR/LAND); pad cells gather the monoid identity, so no masking is needed
on the hot path.  This is the merge/row-balanced SpMV of the design
brief (BASELINE.json) expressed in the operations this hardware runs at
full speed.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

BRANCH = 8


def _cdiv(a, b):
    return -(-a // b)


class Csr8Plan:
    """Static, device-resident SpMV plan for one (matrix, orientation)."""

    __slots__ = ("nrows", "ncols", "nnz", "cols_p", "vals_p", "pad_mask",
                 "levels", "final_src", "row_present", "n_blocks")

    def __init__(self, rows, cols, vals, nrows, ncols):
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        self.nrows = nrows
        self.ncols = ncols
        self.nnz = len(rows)
        idt = np.int32 if max(nrows, ncols, self.nnz) < 2**31 else np.int64

        urows, starts, degs = np.unique(rows, return_index=True,
                                        return_counts=True)
        # level-1 blocks: ceil(d/8) per present row
        b_r = _cdiv(degs, BRANCH)
        m = int(b_r.sum()) if len(b_r) else 0
        m = max(m, 1)
        P = m * BRANCH

        # slot-major fill: edge k of present-row i goes to block
        # (block_start[i] + k//8), slot (k%8) -> position slot*m + block
        blk_start = np.zeros(len(urows), np.int64)
        if len(b_r):
            blk_start[1:] = np.cumsum(b_r)[:-1]
        k_within = np.arange(self.nnz) - np.repeat(starts, degs)
        blk = np.repeat(blk_start, degs) + k_within // BRANCH
        slot = k_within % BRANCH
        pos = slot * m + blk

        cols_p = np.full(P, ncols, np.int64)  # pad -> reserved x cell
        vals_p = np.zeros(P, vals.dtype)
        cols_p[pos] = cols
        vals_p[pos] = vals
        pad_mask = np.zeros(P, bool)
        pad_mask[pos] = True

        self.cols_p = jnp.asarray(cols_p.astype(idt))
        self.vals_p = jnp.asarray(vals_p)
        self.pad_mask = jnp.asarray(pad_mask)
        self.n_blocks = m

        # ---- reduction plan over block partials -------------------------
        # state: for active rows, a contiguous run [start, start+len) in
        # the previous level's output. Retired rows record (level, pos).
        levels = []          # list of jnp index arrays, shape (8 * m_l,)
        retire_level = np.zeros(len(urows), np.int64)
        retire_pos = blk_start.copy()
        lens = b_r.copy()
        starts_l = blk_start.copy()
        active = lens > 1
        level_sizes = [m]
        li = 0
        while active.any():
            li += 1
            a_lens = lens[active]
            a_starts = starts_l[active]
            nb = _cdiv(a_lens, BRANCH)
            m2 = int(nb.sum())
            # emit gather indices, slot-major (8, m2): child j of block q
            nb_start = np.zeros(len(nb), np.int64)
            nb_start[1:] = np.cumsum(nb)[:-1]
            q_within = np.arange(m2) - np.repeat(nb_start, nb)
            base = np.repeat(a_starts, nb) + q_within * BRANCH
            lim = np.repeat(a_starts + a_lens, nb)
            gidx = np.zeros((BRANCH, m2), np.int64)
            for s in range(BRANCH):
                src = base + s
                ok = src < lim
                gidx[s] = np.where(ok, src + 1, 0)  # +1: ident cell at 0
            levels.append(jnp.asarray(gidx.reshape(-1).astype(idt)))
            level_sizes.append(m2)
            # update active rows
            new_lens = lens.copy()
            new_starts = starts_l.copy()
            new_lens[active] = nb
            new_starts[active] = nb_start
            lens, starts_l = new_lens, new_starts
            newly_done = active & (lens == 1)
            retire_level[newly_done] = li
            retire_pos[newly_done] = starts_l[newly_done]
            active = lens > 1

        # final gather: concat buffer = [ident] + lvl0_out + lvl1_out + ...
        offsets = np.zeros(len(level_sizes), np.int64)
        offsets[0] = 1
        for i in range(1, len(level_sizes)):
            offsets[i] = offsets[i - 1] + level_sizes[i - 1]
        final = np.zeros(nrows, np.int64)  # 0 -> ident (empty rows)
        final[urows] = offsets[retire_level] + retire_pos
        self.levels = levels
        self.final_src = jnp.asarray(final.astype(idt))
        row_present = np.zeros(nrows, bool)
        row_present[urows] = True
        self.row_present = jnp.asarray(row_present)


_SUMS = {
    "PLUS": lambda a: jnp.sum(a, axis=0),
    "MIN": lambda a: jnp.min(a, axis=0),
    "MAX": lambda a: jnp.max(a, axis=0),
    "TIMES": lambda a: jnp.prod(a, axis=0),
    "LOR": lambda a: jnp.max(a, axis=0),
    "LAND": lambda a: jnp.min(a, axis=0),
    "ANY": lambda a: jnp.max(a, axis=0),
}


def plan_supported(semiring):
    add_op = semiring.add_monoid.binaryop
    mul = semiring.mul_op
    return (add_op.builtin and mul.builtin
            and add_op.op in _SUMS and not mul.positional)


def reduce_partials(plan, prod, add_name, ident):
    """Run the gather-pyramid reduction of slot-major block partials down
    to one value per row.  `prod` has shape (8 * n_blocks,)."""
    fold = _SUMS[add_name]
    s = fold(prod.reshape(BRANCH, plan.n_blocks))
    outs = [s]
    for gidx in plan.levels:
        src = jnp.concatenate([ident[None], s])
        g = src[gidx].reshape(BRANCH, -1)
        s = fold(g)
        outs.append(s)
    buf = jnp.concatenate([ident[None]] + outs)
    return buf[plan.final_src]


def spmv_dense_x(plan, x, semiring, out_dtype):
    """y = A (+.x) x for a DENSE x array (no mask); returns (vals, mask).

    The pad column points at a reserved trailing x cell holding the add
    identity, so padding contributes the identity with no extra masking
    for FIRST/SECOND/TIMES/PLUS/MIN/MAX/DIV muls; PAIR-like muls apply
    the static pad mask instead.
    """
    out_dtype = np.dtype(out_dtype)
    add = semiring.add_monoid.binaryop.op
    mul = semiring.mul_op
    ident = jnp.asarray(semiring.add_monoid.identity(out_dtype))
    if add in ("LOR", "LAND", "ANY"):
        ident_x = jnp.zeros((), x.dtype) if add != "LAND" else \
            jnp.ones((), x.dtype)
    else:
        ident_x = ident.astype(x.dtype)
    x_ext = jnp.concatenate([x, ident_x[None]])
    xe = x_ext[plan.cols_p]
    prod = mul.apply(plan.vals_p.astype(out_dtype), xe.astype(out_dtype))
    if mul.op in ("PAIR",) or add in ("LOR", "LAND", "ANY"):
        prod = jnp.where(plan.pad_mask, prod, ident)
    if add in ("LOR", "LAND", "ANY"):
        prod = (prod != 0).astype(jnp.int8) if prod.dtype != jnp.bool_ \
            else prod.astype(jnp.int8)
        y = reduce_partials(plan, prod, add, jnp.asarray(
            0 if add != "LAND" else 1, jnp.int8))
        y = (y > 0).astype(out_dtype)
    else:
        y = reduce_partials(plan, prod.astype(out_dtype), add, ident)
    return y, plan.row_present


@partial(jax.jit, static_argnames=("semiring", "out_dtype", "n_blocks",
                                   "flip_mul"))
def spmv_masked_x(plan_cols, plan_vals, plan_pad, plan_levels, final_src,
                  n_blocks, row_present, x_vals, x_mask, semiring,
                  out_dtype, flip_mul=False):
    """Semiring SpMV with a (vals, mask) x: contributions only from
    present x entries; output mask = rows with >= 1 contribution."""

    class _P:  # lightweight plan view for reduce_partials
        pass

    plan = _P()
    plan.n_blocks = n_blocks
    plan.levels = plan_levels
    plan.final_src = final_src

    out_dtype = np.dtype(out_dtype)
    add = semiring.add_monoid.binaryop.op
    mul = semiring.mul_op
    ident = jnp.asarray(semiring.add_monoid.identity(out_dtype))

    xm_ext = jnp.concatenate([x_mask, jnp.zeros((1,), jnp.bool_)])
    xv_ext = jnp.concatenate([x_vals, jnp.zeros((1,), x_vals.dtype)])
    xe = xv_ext[plan_cols]
    valid = jnp.logical_and(plan_pad, xm_ext[plan_cols])
    if flip_mul:
        prod = mul.apply(xe.astype(out_dtype), plan_vals.astype(out_dtype))
    else:
        prod = mul.apply(plan_vals.astype(out_dtype), xe.astype(out_dtype))
    if add in ("LOR", "LAND", "ANY"):
        pb = jnp.logical_and(valid, prod != 0 if prod.dtype != jnp.bool_
                             else prod)
        if add == "LAND":
            data = jnp.where(valid, pb, True).astype(jnp.int8)
            y = reduce_partials(plan, data, "LAND", jnp.asarray(1, jnp.int8))
        else:
            y = reduce_partials(plan, pb.astype(jnp.int8), "LOR",
                                jnp.asarray(0, jnp.int8))
        y = (y > 0)
        if out_dtype != np.bool_:
            y = y.astype(out_dtype)
    else:
        data = jnp.where(valid, prod, ident).astype(out_dtype)
        y = reduce_partials(plan, data, add, ident)
    cnt = reduce_partials(plan, valid.astype(jnp.int32), "PLUS",
                          jnp.asarray(0, jnp.int32))
    y_mask = cnt > 0
    y = jnp.where(y_mask, y.astype(out_dtype), jnp.zeros((), out_dtype))
    return y, y_mask


def run_spmv_masked(plan, x_vals, x_mask, semiring, out_dtype,
                    flip_mul=False):
    return spmv_masked_x(plan.cols_p, plan.vals_p, plan.pad_mask,
                         tuple(plan.levels), plan.final_src, plan.n_blocks,
                         plan.row_present, x_vals, x_mask, semiring,
                         np.dtype(out_dtype), flip_mul)
