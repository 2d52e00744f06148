"""Device-side eWise union/intersect/select for the sorted-COO tier.

The reference runs eWiseAdd/eWiseMult/select as parallel C loops inside
SuiteSparse (``pygraphblas/matrix.py:1231-1415``, ``matrix.py:2136``).
The host twin here is ``core/coosem.py`` + ``core/coosparse.py`` —
single-pass native merges, but on one core.  This module is the TPU
path for large inputs.

Design, driven by the measured kernel costs on this chip (PERF.md):
XLA gathers/scatters lower to ~8 cycles per ELEMENT, while
``lax.sort`` runs at ~0.2-0.4 Gelem/s — so every irregular step is a
*sort*, never a gather:

  union/intersect:  one stable multi-operand sort of the tagged
                    concatenation (both inputs are already canonical,
                    so this is a merge the sorter finishes in its last
                    passes), adjacent-equal matching, traced-op combine.
  compaction:       a second stable flag-keyed sort moves the kept
                    entries to the front in order (sort-based stream
                    compaction; a scatter would be 8 cyc/elem).

Inputs are padded to power-of-two buckets with out-of-range sentinel
keys so repeated calls of similar size reuse one compiled executable.
Coordinates must fit int32 (the 2^60-dimension hypersparse tier keeps
the host path); values travel in the caller-chosen compute dtype.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

_SENT = np.int32(np.iinfo(np.int32).max)


def _bucket(n):
    b = 1 << 10
    while b < n:
        b <<= 1
    return b


def _pad_tagged(ra, ca, va, rb, cb, vb, vdtype):
    """Concatenate + pad to a bucket with sentinel keys.  Sentinel rows
    use key (INT32_MAX, position) — distinct, larger than any real key,
    tag 2 (invalid)."""
    na, nb = len(ra), len(rb)
    n = na + nb
    b = _bucket(max(n, 1))
    pad = b - n
    r = np.empty(b, np.int32)
    c = np.empty(b, np.int32)
    t = np.empty(b, np.int8)
    v = np.zeros(b, vdtype)
    r[:na] = ra
    r[na:n] = rb
    c[:na] = ca
    c[na:n] = cb
    t[:na] = 0
    t[na:n] = 1
    v[:na] = va
    v[na:n] = vb
    r[n:] = _SENT
    c[n:] = np.arange(pad, dtype=np.int32)
    t[n:] = 2
    return r, c, t, v


@functools.lru_cache(maxsize=64)
def _ewise_kernel(fn_key, union, vdtype_str, odtype_str):
    """Compiled union/intersect over one padded bucket shape family.
    fn_key: (id-stable callable wrapper, see _fn_key)."""
    fn = fn_key.fn
    vdt = jnp.dtype(vdtype_str)
    odt = jnp.dtype(odtype_str)

    @jax.jit
    def kern(r, c, t, v):
        t32 = t.astype(jnp.int32)
        # stable 2-key sort: equal (r, c) keeps concat order (A then B)
        r, c, t32, v = jax.lax.sort((r, c, t32, v), num_keys=2,
                                    is_stable=True)
        nxt_same = jnp.concatenate([
            (r[1:] == r[:-1]) & (c[1:] == c[:-1]),
            jnp.zeros(1, bool)])
        prv_same = jnp.concatenate([
            jnp.zeros(1, bool),
            (r[1:] == r[:-1]) & (c[1:] == c[:-1])])
        valid = t32 < 2
        v_next = jnp.concatenate([v[1:], v[:1]])
        combined = fn(v, v_next)
        if union:
            keep = valid & ~prv_same
            out_v = jnp.where(nxt_same, combined.astype(odt),
                              v.astype(odt))
        else:
            keep = valid & nxt_same
            out_v = combined.astype(odt)
        count = jnp.sum(keep.astype(jnp.int32))
        # sort-based compaction: kept entries to the front, order kept
        flag = jnp.where(keep, 0, 1).astype(jnp.int32)
        sv = out_v.astype(jnp.uint8) if out_v.dtype == jnp.bool_ else out_v
        _, r2, c2, v2 = jax.lax.sort(
            (flag, r, c, sv), num_keys=1, is_stable=True)
        return r2, c2, v2.astype(odt), count

    return kern


class _FnKey:
    """Hashable wrapper giving an op closure a stable cache identity."""

    __slots__ = ("fn", "key")

    def __init__(self, fn, key):
        self.fn = fn
        self.key = key

    def __hash__(self):
        return hash(self.key)

    def __eq__(self, other):
        return isinstance(other, _FnKey) and self.key == other.key


def ewise(ra, ca, va, rb, cb, vb, fn, fn_id, compute_dtype, out_dtype,
          union=True):
    """Union (eadd) / intersection (emult) of two canonical COOs on
    device.  fn: traced binary op over compute_dtype arrays; fn_id: a
    hashable identity for executable caching.  Returns canonical
    (rows, cols, vals) numpy triples in out_dtype."""
    vdt = np.dtype(compute_dtype)
    odt = np.dtype(out_dtype)
    r, c, t, v = _pad_tagged(
        np.asarray(ra, np.int32), np.asarray(ca, np.int32),
        np.asarray(va, vdt), np.asarray(rb, np.int32),
        np.asarray(cb, np.int32), np.asarray(vb, vdt), vdt)
    kern = _ewise_kernel(_FnKey(fn, fn_id), bool(union), vdt.str, odt.str)
    r2, c2, v2, count = kern(jnp.asarray(r), jnp.asarray(c),
                             jnp.asarray(t), jnp.asarray(v))
    n = int(count)
    return (np.asarray(r2[:n]).astype(np.int64),
            np.asarray(c2[:n]).astype(np.int64),
            np.asarray(v2[:n]).astype(odt))


@functools.lru_cache(maxsize=64)
def _select_kernel(fn_key, vdtype_str):
    fn = fn_key.fn

    @jax.jit
    def kern(r, c, v, valid_n, thunk):
        pos = jnp.arange(r.shape[0])
        keep = fn(r, c, v, thunk) & (pos < valid_n)
        count = jnp.sum(keep.astype(jnp.int32))
        flag = jnp.where(keep, 0, 1).astype(jnp.int32)
        sv = v.astype(jnp.uint8) if v.dtype == jnp.bool_ else v
        _, r2, c2, v2 = jax.lax.sort(
            (flag, r, c, sv), num_keys=1, is_stable=True)
        return r2, c2, v2.astype(v.dtype), count

    return kern


def select(rows, cols, vals, fn, fn_id, thunk=0):
    """Predicate compaction of a canonical COO on device.  fn(r, c, v,
    thunk) -> bool mask (traced).  Returns canonical numpy triples."""
    vdt = np.asarray(vals).dtype
    n = len(rows)
    b = _bucket(max(n, 1))
    r = np.full(b, _SENT, np.int32)
    c = np.zeros(b, np.int32)
    v = np.zeros(b, vdt)
    r[:n] = rows
    c[:n] = cols
    v[:n] = vals
    kern = _select_kernel(_FnKey(fn, fn_id), vdt.str)
    # thunk keeps its own dtype: positional select ops (TRIL/TRIU/...)
    # carry an int64 offset compared against coordinates, not values
    r2, c2, v2, count = kern(jnp.asarray(r), jnp.asarray(c),
                             jnp.asarray(v), n, jnp.asarray(thunk))
    k = int(count)
    return (np.asarray(r2[:k]).astype(np.int64),
            np.asarray(c2[:k]).astype(np.int64),
            np.asarray(v2[:k]))


def eligible(na, nb, max_row, max_col, vdtype, out_dtype):
    """Device-tier eligibility: combined size over the threshold (or
    forced), int32-expressible coordinates, plain numeric dtypes."""
    from ..base import config

    if config.ewise_engine == "host":
        return False
    if max(max_row, max_col) >= (1 << 31) - 1:
        return False
    for dt in (np.dtype(vdtype), np.dtype(out_dtype)):
        if dt.kind not in "biuf" or dt.itemsize > 8:
            return False
    if config.ewise_engine == "device":
        return True
    return na + nb >= config.ewise_device_min
