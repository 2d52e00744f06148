"""Gather-free semiring SpMV: the x-decode / permute / fold pipeline.

This is the TPU-native replacement for SuiteSparse's masked SpMV C
kernels (reference call sites: ``lib.GrB_mxv`` at matrix.py:2716,
``lib.GrB_vxm`` at vector.py:961).  Design driven by measured hardware
behavior (PERF.md): arbitrary XLA gathers/scatters cost ~8 cyc/element,
so every irregular move is restructured into monotone windowed gathers
(core/mono.py), one static Benes permutation (core/perm.py), and
dense lanewise folds:

  1. decode+mul   xe = mul(vals, x[col]) in column-sorted order — the
                  column index sequence is monotone, so this is a
                  windowed lane-gather, not a scatter/gather.
  2. permute      one static Benes permutation moves products from
                  column order to a slot-major row-grouped layout
                  (8 slots x M groups, each group = 8 edges of one row).
  3. fold         axis-0 fold (8, M) -> per-group partials, then log8
                  levels of slot-major monotone-gather folds; rows
                  retire once reduced to a single cell.
  4. place        per retirement level, one masked monotone placement
                  into the dense output vector.

All plan data is static per (matrix, orientation, dtype); execution is
a pure jit-composable function, so whole algorithm loops (fused.py)
compile to single XLA programs with zero per-iteration dispatch.
"""

import hashlib
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from .mono import MonoPlan, mono_gather, mono_cascade
from .perm import PermPlan

# build cost is significant (seconds): only worth it on the hot path
MIN_NNZ = 1 << 15

# plan building costs minutes at GAP scale (the Benes routing); plans are
# pure functions of the matrix structure, so cache them on disk keyed by
# content hash (analogous to the reference's .grb binfile caches,
# gap/prmark.py:48)
PLAN_CACHE_DIR = os.environ.get("PYGB_PLAN_CACHE", "/tmp/pygb_plans")
_PLAN_VERSION = 14

_ADDS = {
    "PLUS": (lambda a, b: a + b, "add"),
    "MIN": (jnp.minimum, "min"),
    "MAX": (jnp.maximum, "max"),
    "TIMES": (lambda a, b: a * b, "times"),
}

_MULS = {
    "TIMES": lambda a, b: a * b,
    "PLUS": lambda a, b: a + b,
    "MINUS": lambda a, b: a - b,
    "RMINUS": lambda a, b: b - a,
    "DIV": lambda a, b: a / b,
    "RDIV": lambda a, b: b / a,
    "FIRST": lambda a, b: a,
    "SECOND": lambda a, b: b,
    "PAIR": lambda a, b: jnp.ones_like(a),
    "MIN": jnp.minimum,
    "MAX": jnp.maximum,
}


def supported(semiring, dtype, nnz):
    if nnz < MIN_NNZ:
        return False
    add = semiring.add_monoid.binaryop
    mul = semiring.mul_op
    return (add.builtin and mul.builtin and add.op in _ADDS
            and mul.op in _MULS and not mul.positional
            and np.dtype(dtype).kind in "fiu")


class XSpmvPlan:
    """Static plan for y[r] = fold_c mul(A[r,c], x[c]) on one matrix.

    A pytree: plan arrays travel through jit as device-buffer arguments
    (constants of this size overflow the remote-compile transport)."""

    __slots__ = ("nrows", "ncols", "nnz", "dtype", "pre", "decode",
                 "perm", "n_perm", "m1", "vals_col", "levels", "places",
                 "masks", "row_present", "s1")

    def _aux(self):
        return (self.nrows, self.ncols, self.nnz, self.dtype, self.n_perm,
                self.m1, self.s1, len(self.levels), len(self.places))

    def _children(self):
        return (self.pre, self.decode, self.perm, self.vals_col,
                tuple(self.levels), tuple(self.places), tuple(self.masks),
                self.row_present)

    @staticmethod
    def _unflatten(aux, children):
        p = XSpmvPlan()
        (p.nrows, p.ncols, p.nnz, p.dtype, p.n_perm, p.m1, p.s1,
         _nl, _np) = aux
        (p.pre, p.decode, p.perm, p.vals_col, lv, pl, mk,
         p.row_present) = children
        p.levels = list(lv)
        p.places = list(pl)
        p.masks = list(mk)
        return p

    @staticmethod
    def cache_path(rows, cols, vals, nrows, ncols, dtype):
        """Disk-cache path for this plan (content-hash keyed), or None
        when the matrix is below the caching threshold."""
        if len(rows) < (1 << 20):
            return None
        h = hashlib.sha1()
        h.update(np.ascontiguousarray(rows, np.int64).tobytes())
        h.update(np.ascontiguousarray(cols, np.int64).tobytes())
        h.update(np.ascontiguousarray(vals).tobytes())
        h.update(f"{nrows}|{ncols}|{np.dtype(dtype).str}|"
                 f"{_PLAN_VERSION}".encode())
        return os.path.join(PLAN_CACHE_DIR, h.hexdigest() + ".plan")

    @staticmethod
    def build(rows, cols, vals, nrows, ncols, dtype, cache=True):
        """rows/cols/vals: canonical COO (any order), numpy arrays."""
        key = None
        if cache:
            key = XSpmvPlan.cache_path(rows, cols, vals, nrows, ncols,
                                       dtype)
        if key is not None and os.path.exists(key):
            try:
                with open(key, "rb") as f:
                    return pickle.load(f)
            except Exception:
                pass
        p = XSpmvPlan._build(rows, cols, vals, nrows, ncols, dtype)
        if key is not None:
            try:
                os.makedirs(PLAN_CACHE_DIR, exist_ok=True)
                tmp = key + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    pickle.dump(p, f, protocol=4)
                os.replace(tmp, key)
            except Exception:
                pass
        return p

    @staticmethod
    def _build(rows, cols, vals, nrows, ncols, dtype):
        p = XSpmvPlan()
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        nnz = len(rows)
        dtype = np.dtype(dtype)
        p.nrows, p.ncols, p.nnz, p.dtype = nrows, ncols, nnz, dtype

        # --- column order: decode plan + values ---------------------------
        # two-stage decode: compact x to the present column ids first
        # (1 monotone gather over n), then gather products in RANK space,
        # where 128 consecutive edges span <= 128 source slots — window
        # counts stay O(1) regardless of how sparse the touched column
        # ids are (skew killed the one-stage windows at GAP scale)
        corder = np.lexsort((rows, cols))
        colv = cols[corder]
        # colv is sorted: O(n) unique + rank (np.unique would re-sort —
        # tens of seconds at GAP scale)
        newc = np.empty(nnz, bool)
        if nnz:
            newc[0] = True
            np.not_equal(colv[1:], colv[:-1], out=newc[1:])
        uniq = colv[newc]
        rank = np.cumsum(newc, dtype=np.int32) - 1
        p.pre = MonoPlan.build(uniq, ncols, dtype.itemsize)
        p.decode = MonoPlan.build(rank, len(uniq), dtype.itemsize)
        vc = np.zeros(p.decode.S * 128, dtype)
        vc[:nnz] = np.asarray(vals, dtype)[corder]
        p.vals_col = jnp.asarray(vc)
        p.s1 = p.decode.S

        # --- row order: degrees, group offsets, slot-major dst ------------
        rorder = np.lexsort((cols, rows))
        rsorted = rows[rorder]
        # rsorted is sorted: O(n) unique/starts/counts
        newr = np.empty(nnz, bool)
        if nnz:
            newr[0] = True
            np.not_equal(rsorted[1:], rsorted[:-1], out=newr[1:])
        starts = np.flatnonzero(newr)
        urows = rsorted[starts]
        degs = np.diff(np.append(starts, nnz))
        g_r = -(-degs // 8)                       # level-1 groups per row
        gof = np.zeros(len(urows), np.int64)
        gof[1:] = np.cumsum(g_r)[:-1]
        m1 = int(g_r.sum()) if len(g_r) else 1
        m1p = -(-m1 // 128) * 128
        p.m1 = m1p
        # bijection space: covers both the slot-major dst (8*m1p) and the
        # (possibly longer, row-padded) decode output (S1*128)
        n_perm = max(8 * m1p, p.decode.S * 128)
        # pad up to the next S*128^D boundary when the overhead is small:
        # a K == 128 permutation unlocks the native whole-plan Benes
        # assembly, the fold8-fused ascend and the fused middle kernel
        # (all gated on full-lane embeddings).  Real plan sizes sit just
        # under the boundary (kron-20: K = 127), so this is typically a
        # <1% pad for a large kernel-path win; sizes that would pad worse
        # than 128/112 keep the exact size.
        from .perm import _choose_shape

        _, _, r0 = _choose_shape(n_perm, 128)
        if -(-n_perm // r0) >= 112:
            n_perm = r0 * 128
        p.n_perm = n_perm

        # dst position of edge: k-th edge of row r (col order within row).
        # Layout: blocks of (8 slots x 128 groups) so the level-0 8-ary
        # fold reduces over the SUBLANE dim of (8, 128) vreg tiles — one
        # in-register op per tile instead of 8 strided 9MB streams.
        # int32 throughout: all positions < n_perm < 2^30
        k_within = (np.arange(nnz, dtype=np.int32)
                    - np.repeat(starts, degs).astype(np.int32))
        grp = np.repeat(gof, degs).astype(np.int32) + k_within // 8
        slot = k_within % 8
        dstpos = (grp // 128) * 1024 + slot * 128 + (grp % 128)
        # src position (col-order index) of the same edge
        inv_corder = np.empty(nnz, np.int32)
        inv_corder[corder] = np.arange(nnz, dtype=np.int32)
        srcpos = inv_corder[rorder]
        # complete to a bijection on n_perm: pads <-> pads
        src_of_dst = np.full(n_perm, -1, np.int64)
        src_of_dst[dstpos] = srcpos
        free_dst = np.flatnonzero(src_of_dst < 0)
        # srcpos is a permutation of [0, nnz): the free sources are
        # exactly the pad tail
        free_src = np.arange(nnz, n_perm, dtype=np.int64)
        src_of_dst[free_dst] = free_src
        p.perm = PermPlan.build(src_of_dst)

        # --- reduction levels + single final placement --------------------
        # level k (k >= 1) folds F_k cells (counts c_k per row) to
        # c_{k+1} = ceil(c_k/8).  Rows do NOT retire early: a reduced
        # row rides along as a single-child group (fold identity pads),
        # so after the last level every present row holds exactly one
        # cell in row order and ONE placement gather builds y.  The
        # ride-along cells cost a few extra Mcells of (cheap, small-
        # span) gather; the per-level placements + full-size wheres
        # they replace cost more (PERF.md round-4).
        levels = []      # MonoPlan per fold level (slot-major idx into F_k)
        c_k = g_r        # cells per row in F_1
        off_k = gof      # row offsets in F_1
        while len(c_k) and c_k.max() > 1:
            c_n = -(-c_k // 8)
            off_n = np.zeros(len(urows), np.int64)
            off_n[1:] = np.cumsum(c_n)[:-1]
            m_next = int(c_n.sum())
            m_next_p = -(-m_next // 128) * 128
            # slot-major child index: child s of group j of row r is
            # F_k[off_k[r] + 8j + s]; groups laid out blockwise: for each
            # block of 128 groups, 8 slot rows of 128.
            gidx = np.full((m_next_p // 128, 8, 128), -1, np.int32)
            rr = np.repeat(np.arange(len(urows)), c_n)
            jj = np.arange(m_next) - np.repeat(off_n, c_n)
            base = off_k[rr] + 8 * jj
            lim = off_k[rr] + c_k[rr]
            for s in range(8):
                child = base + s
                ok = child < lim
                gidx[np.arange(m_next) // 128, s,
                     np.arange(m_next) % 128] = np.where(ok, child, -1)
            levels.append(MonoPlan.build(gidx.reshape(-1),
                                         int(c_k.sum()), dtype.itemsize))
            c_k = c_n
            off_k = off_n
        # final placement: present row r's value sits at its rank (rows
        # are 1 cell each after the last level, in row order)
        pos_y = np.full(nrows, -1, np.int64)
        pos_y[urows] = off_k
        p.levels = levels
        p.places = [MonoPlan.build(pos_y, max(1, int(c_k.sum())),
                                   dtype.itemsize)]
        p.masks = []
        rp = np.zeros(nrows, bool)
        rp[rows] = True
        p.row_present = jnp.asarray(rp)
        return p


jax.tree_util.register_pytree_node(
    XSpmvPlan,
    lambda p: (p._children(), p._aux()),
    XSpmvPlan._unflatten)


def xspmv(plan, x, semiring, out_dtype, flip_mul=False):
    """Execute y = A (add.mul) x with dense x; returns (y, present_mask).

    flip_mul: the multiply's operand roles are (x, A) instead of (A, x)
    — required by vxm with non-commutative muls."""
    out_dtype = np.dtype(out_dtype)
    addop = semiring.add_monoid.binaryop.op
    fold = _ADDS[addop][0]
    mul = _MULS[semiring.mul_op.op]
    if flip_mul:
        mul = (lambda m: lambda a, b: m(b, a))(mul)
    ident = np.asarray(semiring.add_monoid.identity(out_dtype))
    fill = ident[()] if ident.shape == () else ident

    xx = x.astype(out_dtype)
    # effective mul under flipped operand roles: vxm passes flip_mul=True,
    # where FIRST selects the vector element and SECOND the matrix element
    mul_name = semiring.mul_op.op
    if flip_mul:
        mul_name = {"FIRST": "SECOND", "SECOND": "FIRST"}.get(
            mul_name, mul_name)
    if mul_name == "FIRST" and addop == "PLUS":
        # product = matrix value: the column-order values ARE the
        # products; no x decode at all.  (PLUS only: vals_col pads are
        # zeros, which must equal the fold identity.)
        prod = plan.vals_col
    elif mul_name == "SECOND":
        # product = x value: skip the matrix-values read entirely
        # (PageRank's plus_second saves a full nnz-sized stream)
        xc = mono_gather(plan.pre, xx, fill)
        prod = mono_gather(plan.decode, xc.reshape(-1), fill)
    else:
        xc = mono_gather(plan.pre, xx, fill)
        prod = mono_gather(plan.decode, xc.reshape(-1), fill,
                           vals=plan.vals_col, mul=mul)
    # the permutation pads the tail (pad cells map to pad sources) with
    # the fold identity internally — no separate concat pass.  The
    # level-0 8-ary fold is FUSED into the permutation's final ascend
    # pass (perm.apply_fold8): the 8*m1-cell intermediate never reaches
    # HBM, and the XLA strided-slice fold pass disappears.
    acc1, _ = plan.perm.apply_fold8(prod.reshape(-1), fill, fold)
    cur = acc1.reshape(-1)[:plan.m1]
    # fused cascade: all fold levels + the final placement in ONE
    # launch (per-level launches cost ~0.1 ms each on tiny data —
    # PERF.md round-4); None -> per-level chain (CPU, odd shapes)
    y2d = mono_cascade(plan.levels, plan.places[0], cur, fill, fold)
    if y2d is not None:
        return y2d.reshape(-1)[:plan.nrows], plan.row_present
    for lp in plan.levels:
        cur = mono_gather(lp, cur.reshape(-1), fill, fold=fold).reshape(-1)
    # single final placement: every present row holds one cell in row
    # order after the last level; absent rows read the -1 pad -> fill
    y = mono_gather(plan.places[0], cur.reshape(-1), fill)
    y = y.reshape(-1)[:plan.nrows]
    return y, plan.row_present
