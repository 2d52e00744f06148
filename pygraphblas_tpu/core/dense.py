"""Dense ("bitmap"/"full") backend kernels.

A bitmap-format container is a pair of device arrays ``(vals, mask)`` —
values plus a boolean presence bitmap.  This is the TPU-native analog of
SuiteSparse's bitmap/full formats (reference sparsity control:
``matrix.py:836-885``): every GraphBLAS operation over it maps to fused
XLA vector ops, and semiring matmuls ride the MXU where the algebra
allows (plus_times / plus_pair / lor_land family).

Every public function here is wrapped in ``jax.jit`` with operator objects
as static arguments; the jit cache specializes one kernel per
(op, dtype, shape) combination — no per-semiring code explosion.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# maximum number of scratch cells the generic (non-MXU) semiring matmul may
# materialize per k-block
_GEN_MXM_BUDGET = 1 << 22


def _truthy(vals):
    if vals.dtype == jnp.bool_:
        return vals
    return vals != 0


def effective_mask(mask_vals, mask_mask, complement, structural):
    """Compute the boolean write mask from a mask container's (vals, mask)."""
    if mask_mask is None:
        w = None
    elif structural:
        w = mask_mask
    else:
        w = jnp.logical_and(mask_mask, _truthy(mask_vals))
    if complement:
        w = jnp.logical_not(w)
    return w


@partial(jax.jit, static_argnames=("accum", "complement", "structural", "replace"))
def writeback(c_vals, c_mask, t_vals, t_mask, mask_vals, mask_mask,
              accum=None, complement=False, structural=False, replace=False):
    """The GraphBLAS masked-accumulate-write:  C<M> (accum)= T.

    Implements the full spec semantics: Z = accum(C, T) (union pattern) or
    T; entries of C in the mask region become Z's; outside the mask region
    entries are kept, or deleted when `replace`.
    """
    t_vals = t_vals.astype(c_vals.dtype)
    if mask_mask is None and complement:
        # complement of no mask = empty write region
        w = jnp.zeros_like(c_mask)
    elif mask_mask is None:
        w = None
    else:
        w = effective_mask(mask_vals, mask_mask, complement, structural)

    if accum is None:
        z_vals, z_mask = t_vals, t_mask
    else:
        both = jnp.logical_and(c_mask, t_mask)
        acc = accum.apply(c_vals, t_vals.astype(c_vals.dtype))
        z_vals = jnp.where(both, acc.astype(c_vals.dtype),
                           jnp.where(t_mask, t_vals, c_vals))
        z_mask = jnp.logical_or(c_mask, t_mask)

    if w is None:
        return jnp.where(z_mask, z_vals, c_vals), z_mask

    out_vals = jnp.where(jnp.logical_and(w, z_mask), z_vals, c_vals)
    if replace:
        out_mask = jnp.where(w, z_mask, False)
    else:
        out_mask = jnp.where(w, z_mask, c_mask)
    return out_vals, out_mask


# ---------------------------------------------------------------------------
# element-wise add (union) / mult (intersection)
# ---------------------------------------------------------------------------


def _pos_grids(shape):
    if len(shape) == 1:
        i = jax.lax.broadcasted_iota(jnp.int64, shape, 0)
        return dict(i=i, j=i)
    i = jax.lax.broadcasted_iota(jnp.int64, shape, 0)
    j = jax.lax.broadcasted_iota(jnp.int64, shape, 1)
    return dict(i=i, j=j)


def _binary_pos(shape):
    g = _pos_grids(shape)
    return dict(i0=g["i"], j0=g["j"], i1=g["i"], j1=g["j"])


@partial(jax.jit, static_argnames=("op", "out_dtype"))
def eadd(a_vals, a_mask, b_vals, b_mask, op, out_dtype):
    """T = A (+) B: union pattern; op applied where both present."""
    a_c = a_vals.astype(out_dtype)
    b_c = b_vals.astype(out_dtype)
    both = jnp.logical_and(a_mask, b_mask)
    z = op.apply(a_c, b_c, _binary_pos(a_vals.shape) if op.positional else None)
    t_vals = jnp.where(both, z.astype(out_dtype),
                       jnp.where(a_mask, a_c, b_c))
    t_mask = jnp.logical_or(a_mask, b_mask)
    return t_vals, t_mask


@partial(jax.jit, static_argnames=("op", "out_dtype"))
def emult(a_vals, a_mask, b_vals, b_mask, op, out_dtype):
    """T = A (*) B: intersection pattern."""
    a_c = a_vals.astype(out_dtype) if op.ztype_rule != "BOOL" else a_vals
    b_c = b_vals.astype(out_dtype) if op.ztype_rule != "BOOL" else b_vals
    z = op.apply(a_c, b_c, _binary_pos(a_vals.shape) if op.positional else None)
    t_mask = jnp.logical_and(a_mask, b_mask)
    t_vals = jnp.where(t_mask, z.astype(out_dtype), jnp.zeros((), out_dtype))
    return t_vals, t_mask


# ---------------------------------------------------------------------------
# apply / select
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("op", "out_dtype"))
def apply_unary(vals, mask, op, out_dtype):
    pos = _pos_grids(vals.shape) if op.positional else None
    z = op.apply(vals, pos).astype(out_dtype)
    return jnp.where(mask, z, jnp.zeros((), out_dtype)), mask


@partial(jax.jit, static_argnames=("op", "out_dtype", "bind_first"))
def apply_binary_bound(vals, mask, scalar, op, out_dtype, bind_first):
    """apply_first / apply_second: one operand bound to a scalar."""
    s = jnp.asarray(scalar)
    if op.positional:
        pos = _binary_pos(vals.shape)
        z = op.apply(vals, vals, pos)
    elif bind_first:
        z = op.apply(s.astype(vals.dtype), vals)
    else:
        z = op.apply(vals, s.astype(vals.dtype))
    z = z.astype(out_dtype)
    return jnp.where(mask, z, jnp.zeros((), out_dtype)), mask


@partial(jax.jit, static_argnames=("op",))
def select(vals, mask, thunk, op):
    """Keep entries where the predicate holds."""
    g = _pos_grids(vals.shape)
    keep = op.apply(g["i"], g["j"], vals, jnp.asarray(thunk))
    t_mask = jnp.logical_and(mask, keep)
    return jnp.where(t_mask, vals, jnp.zeros_like(vals)), t_mask


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("monoid",))
def reduce_all(vals, mask, monoid):
    """Reduce every present entry to a scalar with the monoid."""
    ident = jnp.asarray(monoid.identity(np.dtype(vals.dtype.name)))
    filled = jnp.where(mask, vals, ident)
    # tree-reduce via jnp reductions for the common monoids
    name = monoid.binaryop.op if monoid.binaryop.builtin else None
    if name == "PLUS":
        return jnp.sum(jnp.where(mask, vals, jnp.zeros_like(vals)))
    if name == "TIMES":
        return jnp.prod(filled)
    if name == "MIN":
        return jnp.min(filled)
    if name == "MAX":
        return jnp.max(filled)
    if name == "LOR":
        return jnp.any(jnp.logical_and(mask, _truthy(vals)))
    if name == "LAND":
        return jnp.all(jnp.where(mask, _truthy(vals), True))
    if name in ("LXOR",):
        return jnp.sum(jnp.logical_and(mask, _truthy(vals)).astype(jnp.int64)) % 2 == 1
    if name == "LXNOR":
        return jnp.logical_not(
            jnp.sum(jnp.logical_and(mask, jnp.logical_not(_truthy(vals)))
                    .astype(jnp.int64)) % 2 == 1)
    if name == "BOR":
        return jax.lax.reduce(filled, ident, jax.lax.bitwise_or,
                              tuple(range(filled.ndim)))
    if name == "BAND":
        return jax.lax.reduce(filled, ident, jax.lax.bitwise_and, tuple(range(filled.ndim)))
    if name == "BXOR":
        return jax.lax.reduce(filled, ident, jax.lax.bitwise_xor, tuple(range(filled.ndim)))
    if name == "BXNOR":
        r = jax.lax.reduce(filled, jnp.zeros_like(ident), jax.lax.bitwise_xor,
                           tuple(range(filled.ndim)))
        n = jnp.asarray(filled.size, jnp.int64)
        # fold of xnor == xor with parity-conditional complement; with an even
        # number of xnor steps the complement cancels.  Compute directly:
        return jnp.where((n % 2) == 1, r, ~r)
    if name == "ANY":
        # pick an arbitrary present entry (first one)
        idx = jnp.argmax(mask.ravel())
        return jnp.where(jnp.any(mask), vals.ravel()[idx], ident)
    # generic monoid: identity-free masked tree fold (user monoids may have
    # no representable identity)
    v, m = _masked_tree_reduce(vals.ravel(), mask.ravel(), monoid.apply)
    return jnp.where(m, v, ident)


def _masked_tree_reduce(vals, mask, add_fn, axis=0):
    """log2-depth fold of present entries along `axis`; absent entries never
    touch the combiner."""
    n = vals.shape[axis]
    size = 1
    while size < n:
        size *= 2
    pad = [(0, 0)] * vals.ndim
    pad[axis] = (0, size - n)
    v = jnp.pad(vals, pad)
    m = jnp.pad(mask, pad)
    while v.shape[axis] > 1:
        half = v.shape[axis] // 2
        lo = jax.lax.slice_in_dim(v, 0, half, axis=axis)
        hi = jax.lax.slice_in_dim(v, half, 2 * half, axis=axis)
        lo_m = jax.lax.slice_in_dim(m, 0, half, axis=axis)
        hi_m = jax.lax.slice_in_dim(m, half, 2 * half, axis=axis)
        both = jnp.logical_and(lo_m, hi_m)
        v = jnp.where(both, add_fn(lo, hi).astype(v.dtype),
                      jnp.where(hi_m, hi, lo))
        m = jnp.logical_or(lo_m, hi_m)
    return jnp.squeeze(v, axis), jnp.squeeze(m, axis)


@partial(jax.jit, static_argnames=("monoid", "axis"))
def reduce_axis(vals, mask, monoid, axis):
    """Row (axis=1) or column (axis=0) reduction to a vector."""
    ident = jnp.asarray(monoid.identity(np.dtype(vals.dtype.name)))
    filled = jnp.where(mask, vals, ident)
    name = monoid.binaryop.op if monoid.binaryop.builtin else None
    if name == "PLUS":
        out = jnp.sum(jnp.where(mask, vals, jnp.zeros_like(vals)), axis=axis)
    elif name == "TIMES":
        out = jnp.prod(filled, axis=axis)
    elif name == "MIN":
        out = jnp.min(filled, axis=axis)
    elif name == "MAX":
        out = jnp.max(filled, axis=axis)
    elif name == "LOR":
        out = jnp.any(jnp.logical_and(mask, _truthy(vals)), axis=axis)
    elif name == "LAND":
        out = jnp.all(jnp.where(mask, _truthy(vals), True), axis=axis)
    elif name == "LXOR":
        out = (jnp.sum(jnp.logical_and(mask, _truthy(vals)).astype(jnp.int64),
                       axis=axis) % 2) == 1
    else:
        out, _ = _masked_tree_reduce(vals, mask, monoid.apply, axis=axis)
    out_mask = jnp.any(mask, axis=axis)
    return out, out_mask


# ---------------------------------------------------------------------------
# semiring matmul
# ---------------------------------------------------------------------------

def _matmul_ok(dtype):
    """Whether the backend's dot_general supports this dtype exactly.

    TPU has no 64-bit or integer MXU paths (XLA's X64 rewriting does not
    cover dot_general); CPU supports everything.
    """
    dtype = np.dtype(dtype)
    if jax.default_backend() == "cpu":
        return True
    return dtype in (np.float32, np.dtype(jnp.bfloat16), np.float16)


def _f32_pattern_matmul(a_mask, b_mask):
    """structural pattern of the product via an MXU matmul of the bitmaps."""
    pa = a_mask.astype(jnp.float32)
    pb = b_mask.astype(jnp.float32)
    return jnp.matmul(pa, pb, preferred_element_type=jnp.float32) > 0


@partial(jax.jit, static_argnames=("semiring", "out_dtype"))
def mxm(a_vals, a_mask, b_vals, b_mask, semiring, out_dtype):
    """Dense semiring matmul: T = A (+).(*) B with structural pattern.

    Fast path: algebras reducible to a standard matmul ride the MXU
    (plus_times, plus_pair, plus_first/second, lor_land & friends).
    Generic path: k-blocked masked broadcast-reduce on the VPU.
    """
    builtin = semiring.add_monoid.binaryop.builtin and semiring.mul_op.builtin
    add = semiring.add_monoid.binaryop.op if builtin else None
    mul = semiring.mul_op.op if builtin else None
    out_dtype = np.dtype(out_dtype)
    is_bool_out = out_dtype == np.bool_
    m, k = a_vals.shape
    k2, n = b_vals.shape
    t_mask = _f32_pattern_matmul(a_mask, b_mask)

    # --- MXU-lowerable algebras -------------------------------------------
    if add == "PLUS" and mul == "PAIR" and not is_bool_out \
            and (jax.default_backend() != "tpu" or k <= (1 << 24)):
        # structural counts: exact in float while count <= k fits the
        # mantissa (f64 on CPU covers any k; f32 on TPU needs k <= 2^24,
        # else fall through to the generic integer path), riding
        # BLAS/MXU instead of the naive-loop integer matmul
        acc = jnp.float32 if jax.default_backend() == "tpu" \
            else jnp.float64
        prod = jnp.matmul(a_mask.astype(acc), b_mask.astype(acc),
                          preferred_element_type=acc)
        return prod.astype(out_dtype), t_mask

    if add == "PLUS" and mul == "TIMES" and not is_bool_out \
            and _matmul_ok(out_dtype):
        av = jnp.where(a_mask, a_vals, jnp.zeros_like(a_vals)).astype(out_dtype)
        bv = jnp.where(b_mask, b_vals, jnp.zeros_like(b_vals)).astype(out_dtype)
        t_vals = jnp.matmul(av, bv, preferred_element_type=out_dtype)
        return t_vals, t_mask

    if add in ("LOR", "ANY") and mul in ("LAND", "PAIR", "FIRST", "SECOND", "TIMES") \
            and is_bool_out:
        av = jnp.logical_and(a_mask, _truthy(a_vals)) if mul in ("LAND", "TIMES", "FIRST") else a_mask
        bv = jnp.logical_and(b_mask, _truthy(b_vals)) if mul in ("LAND", "TIMES", "SECOND") else b_mask
        if mul in ("PAIR",):
            av, bv = a_mask, b_mask
        if mul == "FIRST":
            bv = b_mask
        if mul == "SECOND":
            av = a_mask
        prod = jnp.matmul(av.astype(jnp.float32), bv.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
        t_vals = prod > 0
        return t_vals, t_mask

    # --- generic semiring: k-blocked masked fold ---------------------------
    # The add monoid is folded ONLY over present products ("first match
    # initializes"), so no identity value is ever injected -- matching
    # SuiteSparse dot/saxpy semantics and supporting user monoids with no
    # representable identity (e.g. log-add).
    mul_op = semiring.mul_op
    add_fn = semiring.add_monoid.apply

    kb = max(1, min(k, _GEN_MXM_BUDGET // max(1, m * n)))
    nblocks = -(-k // kb)
    kpad = nblocks * kb
    a_v = jnp.pad(a_vals.astype(out_dtype), ((0, 0), (0, kpad - k)))
    a_m = jnp.pad(a_mask, ((0, 0), (0, kpad - k)))
    b_v = jnp.pad(b_vals.astype(out_dtype), ((0, kpad - k), (0, 0)))
    b_m = jnp.pad(b_mask, ((0, kpad - k), (0, 0)))

    i_grid = jax.lax.broadcasted_iota(jnp.int64, (m, kb, n), 0)
    j_grid = jax.lax.broadcasted_iota(jnp.int64, (m, kb, n), 2)
    kk_grid = jax.lax.broadcasted_iota(jnp.int64, (m, kb, n), 1)

    def combine(acc, acc_m, val, val_m):
        both = jnp.logical_and(acc_m, val_m)
        merged = jnp.where(both, add_fn(acc, val).astype(acc.dtype),
                           jnp.where(val_m, val, acc))
        return merged, jnp.logical_or(acc_m, val_m)

    def body(blk, carry):
        acc, acc_m = carry
        k0 = blk * kb
        ab = jax.lax.dynamic_slice(a_v, (0, k0), (m, kb))         # (m, kb)
        abm = jax.lax.dynamic_slice(a_m, (0, k0), (m, kb))
        bb = jax.lax.dynamic_slice(b_v, (k0, 0), (kb, n))         # (kb, n)
        bbm = jax.lax.dynamic_slice(b_m, (k0, 0), (kb, n))
        x = ab[:, :, None]
        y = bb[None, :, :]
        pm = jnp.logical_and(abm[:, :, None], bbm[None, :, :])    # (m, kb, n)
        if mul_op.positional:
            pos = dict(i0=i_grid, j0=kk_grid + k0, i1=kk_grid + k0, j1=j_grid)
            z = mul_op.apply(x, y, pos).astype(out_dtype)
            z = jnp.broadcast_to(z, (m, kb, n))
        else:
            z = mul_op.apply(jnp.broadcast_to(x, (m, kb, n)),
                             jnp.broadcast_to(y, (m, kb, n))).astype(out_dtype)
        part, part_m = z[:, 0, :], pm[:, 0, :]
        for q in range(1, kb):
            part, part_m = combine(part, part_m, z[:, q, :], pm[:, q, :])
        return combine(acc, acc_m, part, part_m)

    acc0 = jnp.zeros((m, n), dtype=out_dtype)
    acc0_m = jnp.zeros((m, n), jnp.bool_)
    t_vals, t_mask2 = jax.lax.fori_loop(0, nblocks, body, (acc0, acc0_m))
    t_vals = jnp.where(t_mask2, t_vals, jnp.zeros_like(t_vals))
    return t_vals, t_mask2


# ---------------------------------------------------------------------------
# transpose / kronecker / extract / assign helpers
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("op", "out_dtype"))
def kronecker(a_vals, a_mask, b_vals, b_mask, op, out_dtype):
    m, n = a_vals.shape
    p, q = b_vals.shape
    a_c = a_vals.astype(out_dtype)
    b_c = b_vals.astype(out_dtype)
    z = op.apply(a_c[:, None, :, None], b_c[None, :, None, :])
    t_vals = z.reshape(m * p, n * q).astype(out_dtype)
    t_mask = jnp.logical_and(a_mask[:, None, :, None],
                             b_mask[None, :, None, :]).reshape(m * p, n * q)
    t_vals = jnp.where(t_mask, t_vals, jnp.zeros((), out_dtype))
    return t_vals, t_mask


@jax.jit
def gather2d(vals, mask, row_idx, col_idx):
    """extract a submatrix by row/col index vectors."""
    v = vals[row_idx][:, col_idx]
    m = mask[row_idx][:, col_idx]
    return v, m


@jax.jit
def scatter2d(c_vals, c_mask, row_idx, col_idx, t_vals, t_mask):
    """assign a submatrix into C at row/col index vectors (pattern write)."""
    rr = row_idx[:, None]
    cc = col_idx[None, :]
    v = c_vals.at[rr, cc].set(t_vals.astype(c_vals.dtype))
    m = c_mask.at[rr, cc].set(t_mask)
    return v, m
