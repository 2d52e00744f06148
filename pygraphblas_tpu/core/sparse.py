"""Device sparse kernels over COO/CSR index arrays.

The compute tier for matrices too large for the dense bitmap path:
semiring SpMV/SpMSpV via gather + segment-reduce (XLA scatter-reduce on
TPU), with a Pallas row-based CSR kernel as the optimized path (see
``core/pallas_spmv.py``).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _segment_reduce(monoid_name, data, segment_ids, num_segments, ident):
    if monoid_name in ("PLUS", "ANY_SUMMABLE"):
        return jax.ops.segment_sum(data, segment_ids, num_segments)
    if monoid_name == "MIN":
        return jax.ops.segment_min(data, segment_ids, num_segments)
    if monoid_name in ("MAX", "ANY"):
        return jax.ops.segment_max(data, segment_ids, num_segments)
    if monoid_name == "TIMES":
        return jax.ops.segment_prod(data, segment_ids, num_segments)
    if monoid_name in ("LOR",):
        return jax.ops.segment_max(data.astype(jnp.int8), segment_ids,
                                   num_segments) > 0
    if monoid_name in ("LAND",):
        return jax.ops.segment_min(data.astype(jnp.int8), segment_ids,
                                   num_segments) > 0
    if monoid_name in ("LXOR",):
        return (jax.ops.segment_sum(data.astype(jnp.int32), segment_ids,
                                    num_segments) % 2) == 1
    raise NotImplementedError(f"segment reduce for monoid {monoid_name}")


@partial(jax.jit, static_argnames=("monoid", "out_dtype", "out_size"))
def coo_segment_reduce(ids, vals, monoid, out_dtype, out_size):
    """Monoid-reduce COO values by row (or column) id into a dense
    (vals, mask) vector pair."""
    out_dtype = np.dtype(out_dtype)
    name = monoid.binaryop.op if monoid.binaryop.builtin else None
    ident = jnp.asarray(monoid.identity(out_dtype))
    data = vals.astype(out_dtype)
    y = _segment_reduce(name, data, ids, out_size, ident)
    cnt = jax.ops.segment_sum(jnp.ones(ids.shape, jnp.int32), ids, out_size)
    y_mask = cnt > 0
    y = jnp.where(y_mask, y.astype(out_dtype), jnp.zeros((), out_dtype))
    return y, y_mask


def _next_pow2(x):
    p = 1
    while p < x:
        p *= 2
    return p


def segment_fold_generic(ids_sorted, vals, add_op):
    """Segment reduce for ANY binary op (user fns, struct UDTs): ids
    sorted; vals numpy (possibly structured).  log(max segment) passes
    of vectorized adjacent-pair combining — no identity value needed.

    Returns (unique_ids, folded_vals)."""
    ids = np.asarray(ids_sorted)
    vals = np.asarray(vals)
    while len(ids):
        starts = np.ones(len(ids), bool)
        starts[1:] = ids[1:] != ids[:-1]
        if starts.all():
            break
        run_id = np.cumsum(starts) - 1
        run0 = np.zeros(run_id[-1] + 1, np.int64)
        run0[run_id[np.nonzero(starts)[0]]] = np.nonzero(starts)[0]
        within = np.arange(len(ids)) - run0[run_id]
        # pair each even-offset element with its odd-offset successor
        is_left = (within % 2 == 0)
        has_right = np.zeros(len(ids), bool)
        has_right[:-1] = is_left[:-1] & (~starts[1:])
        left = np.nonzero(has_right)[0]
        lone = np.nonzero(is_left & ~has_right)[0]
        merged = add_op.apply(vals[left], vals[left + 1])
        keep_ids = np.concatenate([ids[left], ids[lone]])
        keep_vals = np.concatenate([np.asarray(merged), vals[lone]])
        order = np.argsort(keep_ids, kind="stable")
        ids, vals = keep_ids[order], keep_vals[order]
    return ids, vals


def coo_segment_reduce_compact(ids_host, vals_host, monoid, out_dtype):
    """Sparse-output segment reduce: monoid-reduce values by arbitrary
    (up to 2^60) ids.  The id space is compacted on the host so the
    device reduction runs over #distinct segments, and the result comes
    back as (unique_ids, values) — every segment is present.

    Inputs are padded to power-of-two shapes (pad entries route to a
    scratch segment) so repeated calls with drifting sizes — BFS levels,
    frontier sweeps — reuse compiled executables instead of re-jitting
    every call."""
    out_dtype = np.dtype(out_dtype)
    uids, inv = np.unique(ids_host, return_inverse=True)
    nseg = len(uids)
    if nseg == 0:
        return uids, np.empty(0, out_dtype)
    n = len(inv)
    np2 = _next_pow2(n)
    ns2 = _next_pow2(nseg + 1)
    idt = np.int32 if ns2 < 2**31 else np.int64
    inv_p = np.full(np2, ns2 - 1, idt)
    inv_p[:n] = inv
    vals_p = np.zeros(np2, np.asarray(vals_host).dtype)
    vals_p[:n] = vals_host
    tv, _ = coo_segment_reduce(jnp.asarray(inv_p), jnp.asarray(vals_p),
                               monoid, out_dtype.str, ns2)
    return uids, np.asarray(tv)[:nseg].astype(out_dtype)


@partial(jax.jit, static_argnames=("semiring", "out_dtype", "out_size",
                                   "flip_mul"))
def coo_spmv(ids_out, ids_in, vals, x_vals, x_mask, semiring, out_dtype,
             out_size, flip_mul=False):
    """Generalized semiring SpMV over COO triples.

    y[i] = add-reduce over entries e with ids_out[e]==i of
           mul(vals[e], x[ids_in[e]]), restricted to present x entries.

    Returns a dense (vals, mask) pair of size `out_size`.
    """
    out_dtype = np.dtype(out_dtype)
    add = semiring.add_monoid.binaryop.op
    mul = semiring.mul_op
    xg = x_vals[ids_in]
    present = x_mask[ids_in]
    if mul.positional:
        # operand roles: mxv y=A.x -> first=A (i0=row=out, j0=col=in),
        # second=x (i1=in, j1=0); vxm w=x'.A (flip_mul) -> first=x'
        # (i0=0, j0=in), second=A (i1=in row, j1=out col)
        z = jnp.zeros_like(ids_in)
        if flip_mul:
            pos = dict(i0=z, j0=ids_in, i1=ids_in, j1=ids_out)
        else:
            pos = dict(i0=ids_out, j0=ids_in, i1=ids_in, j1=z)
        prod = mul.apply(None, None, pos).astype(out_dtype)
    elif flip_mul:
        prod = mul.apply(xg.astype(out_dtype), vals.astype(out_dtype))
    else:
        prod = mul.apply(vals.astype(out_dtype), xg.astype(out_dtype))
    ident = jnp.asarray(semiring.add_monoid.identity(out_dtype))
    # route absent entries to a scratch segment so they don't contribute
    seg = jnp.where(present, ids_out, out_size)
    if add in ("MIN", "MAX", "TIMES", "LAND"):
        data = jnp.where(present, prod, ident)
    else:
        data = jnp.where(present, prod,
                         jnp.zeros_like(prod) if prod.dtype != jnp.bool_
                         else jnp.zeros_like(prod))
    y = _segment_reduce(add, data, seg, out_size + 1, ident)[:-1]
    cnt = jax.ops.segment_sum(present.astype(jnp.int32), seg, out_size + 1)
    y_mask = cnt[:-1] > 0
    y = jnp.where(y_mask, y.astype(out_dtype), jnp.zeros((), out_dtype))
    return y, y_mask
