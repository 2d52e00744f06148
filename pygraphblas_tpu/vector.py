"""The GraphBLAS Vector container, TPU-native.

1-D counterpart of :class:`~.matrix.Matrix` (reference surface:
``pygraphblas/vector.py``).  Vectors are bitmap-format device arrays
``(vals, mask)`` whenever the size fits the dense budget; huge logical
sizes (up to ``GxB_INDEX_MAX``) fall back to host-staged sorted COO.
"""

import operator
import random as _stdlib_random
import types as _pytypes
from array import array
from functools import partial

import numpy as np
import jax.numpy as jnp

from .base import (
    NULL,
    _timed,
    GxB_INDEX_MAX,
    NoValue,
    DimensionMismatch,
    InsufficientSpace,
    InvalidValue,
    InvalidIndex,
    _build_range,
    _get_bin_op,
    _get_select_op,
    config,
)
from . import types
from .types import promote, _gb_from_type, _type_from_value
from .binaryop import BinaryOp, current_accum, current_binop
from .monoid import Monoid, current_monoid
from .semiring import Semiring, current_semiring
from .selectop import SelectOp, DEFAULT_THUNKS
from .descriptor import Descriptor, Default, T0, T1, current_desc
from .scalar import Scalar
from .core import dense as dk
from .core import coosparse as ck

__all__ = ["Vector"]


def _is_scalar(x):
    return isinstance(x, (bool, int, float, complex, np.generic))


def _is_int(x):
    return isinstance(x, (int, np.integer)) and not isinstance(x, bool)


class Vector:
    """GraphBLAS Vector.

    >>> v = Vector.from_lists([0, 1, 2], [1, 2, 3])
    >>> print(v)
    0| 1
    1| 2
    2| 3
    """

    __slots__ = (
        "type",
        "_size",
        "_fmt",
        "_vals",
        "_mask",
        "_idx_h",
        "_vals_h",
        "_iso_v",       # iso format: the single repeated value
        "_pending",
        "_nvals_c",
        "_host_c",
        "_hyper_switch",
        "_sparsity",
    )

    def __init__(self, typ, size, fmt=None):
        self.type = typ
        self._size = int(size)
        self._pending = []
        self._nvals_c = None
        self._host_c = None
        self._iso_v = None
        self._hyper_switch = config.hyper_switch
        self._sparsity = 15  # GxB_AUTO_SPARSITY
        if fmt is None:
            fmt = "bitmap" if self._fits_bitmap(size, typ) else "coo"
        self._fmt = fmt
        if fmt == "iso":
            self._vals = self._mask = None
            self._idx_h = self._vals_h = None
        elif fmt == "bitmap":
            self._vals = jnp.zeros((self._size,), typ._jnp_dtype())
            self._mask = jnp.zeros((self._size,), jnp.bool_)
            self._idx_h = self._vals_h = None
        else:
            self._vals = self._mask = None
            self._idx_h = np.empty(0, np.int64)
            self._vals_h = np.empty(0, typ._numpy_t)

    @staticmethod
    def _fits_bitmap(size, typ=None):
        if typ is not None and not typ._allows_bitmap:
            return False
        return size <= config.vector_max_cells

    # ------------------------------------------------------------------
    # constructors
    # ------------------------------------------------------------------

    @classmethod
    def sparse(cls, typ, size=None, fill=None, mask=None):
        """Create an empty sparse Vector (unbounded size defaults to
        GxB_INDEX_MAX).

        >>> v = Vector.sparse(types.INT64, 3)
        >>> v.size
        3
        """
        if size is None:
            size = GxB_INDEX_MAX
        v = cls(typ, size)
        if fill is not None and mask is not None:
            v.assign_scalar(fill, mask=mask)
        return v

    @classmethod
    def dense(cls, typ, size=None, fill=None):
        """Create a dense Vector: all elements present.

        >>> print(Vector.dense(types.INT64, 3, fill=7))
        0| 7
        1| 7
        2| 7
        >>> print(Vector.dense(types.FP32, 3, fill=1.5))
        0|1.5
        1|1.5
        2|1.5
        """
        if size is None:
            size = GxB_INDEX_MAX
        if not cls._fits_bitmap(size, typ):
            if size > (1 << 27) or not typ._allows_bitmap:
                raise InsufficientSpace(
                    "dense vector too large (use Vector.iso for O(1) "
                    "all-same-value vectors)")
            v = cls(typ, size, fmt="coo")
            fillv = typ.default_zero if fill is None else fill
            v._set_coo(np.arange(size, dtype=np.int64),
                       np.full(size, typ._coerce(fillv), typ._numpy_t))
            return v
        v = cls(typ, size, fmt="bitmap")
        fillv = typ.default_zero if fill is None else fill
        v._vals = jnp.full((v._size,), typ._coerce(fillv), typ._jnp_dtype())
        v._mask = jnp.ones((v._size,), jnp.bool_)
        v._invalidate()
        return v

    @classmethod
    def iso(cls, value, size=GxB_INDEX_MAX):
        """Dense Vector of one repeated value; type inferred.  Sizes past
        the dense budget store the value once (O(1), like SuiteSparse
        iso-full, reference matrix.py:233-266) — usable as an mxv/vxm
        operand, in reductions, and for element reads at any size.

        >>> print(Vector.iso(3, 2))
        0| 3
        1| 3
        """
        typ = _type_from_value(value)
        if not cls._fits_bitmap(size, typ):
            v = cls(typ, size, fmt="iso")
            v._iso_v = typ._coerce(value)
            return v
        return cls.dense(typ, size, fill=value)

    @classmethod
    def from_lists(cls, I, V=None, size=None, typ=None):
        """Create from index and value lists.

        >>> print(Vector.from_lists([0, 2], [1, 2]))
        0| 1
        1|
        2| 2
        """
        if V is None:
            V = [True] * len(I)
            typ = types.BOOL if typ is None else typ
        if len(I) != len(V):
            raise InvalidValue("index and value lists must be the same length")
        if size is None:
            size = max(I) + 1
        if typ is None:
            typ = _type_from_value(V[0])
        v = cls.sparse(typ, size)
        v._build(np.asarray(I), np.asarray(V))
        return v

    @classmethod
    def from_list(cls, I):
        """Create a dense vector from a list of values.

        >>> print(Vector.from_list([1, 2, 3]))
        0| 1
        1| 2
        2| 3
        """
        size = len(I)
        assert size > 0
        typ = _gb_from_type(type(I[0]))
        v = cls.sparse(typ, size)
        v._build(np.arange(size, dtype=np.int64), np.asarray(I))
        return v

    @classmethod
    def from_1_to_n(cls, n):
        """Vector of values 1..n.

        >>> v = Vector.from_1_to_n(3)
        >>> print(v)
        0| 1
        1| 2
        2| 3
        """
        v = cls.sparse(types.INT64, n)
        v._build(np.arange(n, dtype=np.int64),
                 np.arange(1, n + 1, dtype=np.int64))
        return v

    @classmethod
    def random(cls, typ, nvals, size=GxB_INDEX_MAX, make_pattern=False,
               seed=None):
        """Random vector (same stdlib-random draw order as the reference,
        vector.py:289-328).

        >>> v = Vector.random(types.INT64, 3, 10, seed=42)
        >>> v.nvals <= 3 and v.size == 10
        True
        """
        from .matrix import _random_value_fn

        V = cls.sparse(typ, size)
        if seed is not None:
            _stdlib_random.seed(seed)
        if V.size == 0:
            nvals = 0
        f = _random_value_fn(typ)
        for _ in range(nvals):
            i = _stdlib_random.randint(0, V.size - 1)
            V[i] = typ.default_one if make_pattern else f()
        return V

    @classmethod
    def from_numpy(cls, arr):
        """Dense vector from a 1-D numpy array.

        >>> import numpy as np
        >>> print(Vector.from_numpy(np.array([1, 2, 3])))
        0| 1
        1| 2
        2| 3
        """
        arr = np.asarray(arr)
        typ = types.MetaType._dtype_type_map[arr.dtype.type]
        v = cls.sparse(typ, arr.shape[0])
        v._build(np.arange(arr.shape[0], dtype=np.int64), arr)
        return v

    # ------------------------------------------------------------------
    # internal plumbing (mirrors Matrix)
    # ------------------------------------------------------------------

    def _invalidate(self):
        self._nvals_c = None
        self._host_c = None

    def _build(self, I, V):
        if len(I) and I.max() >= self._size:
            raise DimensionMismatch("index out of bounds in build")
        i, _, v = ck.build(I, np.zeros_like(np.asarray(I)), V,
                           self.type._numpy_t)
        if self._fmt == "bitmap":
            self._vals = self._vals.at[i].set(jnp.asarray(v))
            self._mask = self._mask.at[i].set(True)
        else:
            self._idx_h, self._vals_h = i, v
        self._invalidate()

    def _flush(self):
        if not self._pending:
            return
        pend = self._pending
        self._pending = []
        I = np.asarray([p[0] for p in pend], np.int64)
        V = np.asarray([p[1] for p in pend], self.type._numpy_t)
        I2, _, V2 = ck.build(I, np.zeros_like(I), V, self.type._numpy_t)
        if self._fmt == "bitmap":
            self._vals = self._vals.at[I2].set(jnp.asarray(V2))
            self._mask = self._mask.at[I2].set(True)
        else:
            merged_i, _, merged_v = ck.merge_pending(
                self._idx_h, np.zeros_like(self._idx_h), self._vals_h,
                I2, np.zeros_like(I2), V2, self.type._numpy_t)
            self._idx_h, self._vals_h = merged_i, merged_v
        self._invalidate()

    def _dense_pair(self, transpose=False):
        self._flush()
        if self._fmt == "iso":
            if not self._fits_bitmap(self._size, self.type):
                raise InsufficientSpace(
                    "iso vector too large to materialize")
            return (jnp.full((self._size,), self._iso_v,
                             self.type._jnp_dtype()),
                    jnp.ones((self._size,), jnp.bool_))
        if self._fmt == "bitmap":
            return self._vals, self._mask
        if not self._fits_bitmap(self._size, self.type):
            raise InsufficientSpace("vector too large for dense path")
        v = jnp.zeros((self._size,), self.type._jnp_dtype())
        m = jnp.zeros((self._size,), jnp.bool_)
        if self._idx_h.size:
            v = v.at[self._idx_h].set(jnp.asarray(self._vals_h))
            m = m.at[self._idx_h].set(True)
        return v, m

    def _set_dense(self, vals, mask):
        self._fmt = "bitmap"
        self._idx_h = self._vals_h = None
        self._vals = vals
        self._mask = mask
        self._invalidate()

    def _host_pair(self):
        self._flush()
        if self._host_c is None:
            v, m = self._dense_pair()
            self._host_c = (np.asarray(v), np.asarray(m))
        return self._host_c

    def _coo(self):
        self._flush()
        if self._fmt == "iso":
            if self._size > (1 << 27):
                raise InsufficientSpace(
                    "iso vector too large to enumerate")
            return (np.arange(self._size, dtype=np.int64),
                    np.full(self._size, self._iso_v, self.type._numpy_t))
        if self._fmt == "coo":
            return self._idx_h, self._vals_h
        v, m = self._host_pair()
        i = np.nonzero(m)[0]
        return i.astype(np.int64), v[i]

    def _writeback(self, out, t_vals, t_mask, mask, accum, desc):
        if mask is not None:
            mv, mm = mask._dense_pair()
            if mv.shape != t_vals.shape:
                raise DimensionMismatch("mask size does not match output")
        else:
            mv = mm = None
        c_vals, c_mask = out._dense_pair()
        if c_vals.shape != t_vals.shape:
            raise DimensionMismatch("output size mismatch")
        nv, nm = dk.writeback(
            c_vals, c_mask, t_vals, t_mask, mv, mm,
            accum=accum, complement=desc.complement,
            structural=desc.structural, replace=desc.replace)
        out._set_dense(nv, nm)
        return out

    def _get_args(self, mask=None, accum=None, desc=None):
        if accum is None:
            accum = current_accum.get(None)
        if accum is not None:
            accum = accum.get_op() if hasattr(accum, "get_op") else accum
        if desc is None:
            desc = current_desc.get(None)
        if desc is None:
            desc = Default
        return mask, accum, desc

    # ------------------------------------------------------------------
    # sparse (COO) writeback — the huge-vector twin of _writeback
    # ------------------------------------------------------------------

    def _set_coo(self, i, v):
        """Install canonical sorted index/value arrays as contents."""
        self._fmt = "coo"
        self._vals = self._mask = None
        self._pending = []
        self._idx_h = np.asarray(i, np.int64)
        self._vals_h = np.asarray(v).astype(self.type._numpy_t)
        self._invalidate()

    def _mask_pair_set(self, mask, desc):
        if mask is None:
            return None, None
        mi, mv = mask._coo()
        from .core import coosem as cs

        return cs.mask_pairs(mi, np.zeros_like(mi), mv, desc.structural)

    _SCALAR_FILL_BUDGET = 1 << 27

    def _assign_scalar_sparse(self, value, iset, mask, accum, desc):
        """Scalar assign on a huge vector: masked full fills take the
        mask's pattern; bounded regions materialize."""
        from .core import coosem as cs
        from .matrix import Matrix as _M

        self._flush()
        val = self.type._coerce(value)
        if iset.kind == "all" and mask is not None \
                and not desc.complement:
            mpi, _ = self._mask_pair_set(mask, desc)
            tv = np.full(len(mpi), val, self.type._numpy_t)
            self._coo_writeback(self, mpi, tv, mask, accum, desc)
            return
        if iset.size > self._SCALAR_FILL_BUDGET:
            raise InsufficientSpace(
                "unbounded scalar fill on a huge vector requires a mask")
        I = np.arange(iset.size, dtype=np.int64)
        tv = np.full(iset.size, val, self.type._numpy_t)
        ci, cv = self._coo()
        mpi, _ = self._mask_pair_set(mask, desc)
        accum_fn = _M._np_binop(accum) if accum is not None else None
        z = np.zeros_like
        nr, _, nv = cs.assign_region(
            ci, z(ci), cv, I, z(I), tv,
            cs.selector(iset, self._size), cs.ArithSelector(0, 1, 1),
            mpi, z(mpi) if mpi is not None else None,
            accum_fn, desc.complement, desc.replace, self.type._numpy_t)
        self._set_coo(nr, nv)

    def _ewise_huge(self, other, op, out, mask, accum, desc, union):
        """Element-wise union/intersection on huge vectors: device
        sort engine (core/dewise.py) for large numeric inputs, host
        sorted-merge otherwise; full mask/accum semantics."""
        from .core import dewise as dw

        ia, va = self._coo()
        ib, vb = other._coo()
        dt = out.type._numpy_t
        dtk = np.dtype(dt)

        if (getattr(op, "udt", None) is None
                and getattr(op, "positional", None) is None
                and op.ztype_rule not in ("CMPLX",)
                and dtk.kind in "biuf"):
            max_i = int(max(ia[-1] if len(ia) else 0,
                            ib[-1] if len(ib) else 0))
            cdt = (np.promote_types(va.dtype, vb.dtype)
                   if op.ztype_rule == "BOOL" else dtk)
            if cdt.kind in "biuf" and dw.eligible(
                    len(ia), len(ib), max_i, 0, cdt, dtk):
                r, _, v = dw.ewise(
                    ia, np.zeros_like(ia), va, ib, np.zeros_like(ib),
                    vb, op.apply, (op, cdt.str, dtk.str), cdt, dtk,
                    union=union)
                return self._coo_writeback(out, r, v, mask, accum, desc)

        def fn(x, y):
            if getattr(op, "udt", None) is not None:
                return np.asarray(op.apply(x, y))  # struct-aware
            if op.ztype_rule != "BOOL":
                x = x.astype(dt)
                y = y.astype(dt)
            return np.asarray(op.apply(jnp.asarray(x), jnp.asarray(y)))

        r, _, v = ck.ewise(ia, np.zeros_like(ia), va, ib,
                           np.zeros_like(ib), vb, fn, dt, union=union)
        return self._coo_writeback(out, r, v, mask, accum, desc)

    def _coo_writeback(self, out, ti, tv, mask, accum, desc):
        """w<m> (accum)= t with t as canonical (idx, vals) arrays.

        When the output fits the dense budget the triples are scattered
        into device arrays and the fused dense writeback runs (keeps
        device residency for the common case); truly huge vectors go
        through the sorted-merge semantics of core/coosem.py."""
        from .core import coosem as cs
        from .matrix import Matrix as _M

        if mask is not None and mask.shape[0] != out.size:
            raise DimensionMismatch("mask size does not match output")
        if out._fits_bitmap(out.size, out.type):
            dt = out.type._jnp_dtype()
            tvd = jnp.zeros((out.size,), dt)
            tmd = jnp.zeros((out.size,), jnp.bool_)
            if len(ti):
                # pad to pow2 so drifting frontier sizes reuse compiled
                # scatters; pad indices are out of bounds -> dropped
                from .core.sparse import _next_pow2

                n = len(ti)
                np2 = _next_pow2(n)
                idx_p = np.full(np2, out.size, np.int64)
                idx_p[:n] = np.asarray(ti, np.int64)
                val_p = np.zeros(np2, out.type._numpy_t)
                val_p[:n] = np.asarray(tv).astype(out.type._numpy_t)
                idx = jnp.asarray(idx_p)
                tvd = tvd.at[idx].set(jnp.asarray(val_p),
                                      mode="drop")
                tmd = tmd.at[idx].set(True, mode="drop")
            return self._writeback(out, tvd, tmd, mask, accum, desc)
        mpi, _ = self._mask_pair_set(mask, desc)
        ci, cv = out._coo()
        accum_fn = _M._np_binop(accum) if accum is not None else None
        z = np.zeros_like
        nr, _, nv = cs.writeback(ci, z(ci), cv, np.asarray(ti, np.int64),
                                 z(np.asarray(ti, np.int64)),
                                 np.asarray(tv),
                                 mpi, z(mpi) if mpi is not None else None,
                                 accum_fn, desc.complement, desc.replace,
                                 out.type._numpy_t)
        out._set_coo(nr, nv)
        return out

    # ------------------------------------------------------------------
    # properties
    # ------------------------------------------------------------------

    @property
    def size(self):
        """Size of the vector.

        >>> Vector.from_list([1, 2, 3]).size
        3
        """
        return self._size

    @property
    def shape(self):
        """Tuple of (size,).

        >>> Vector.sparse(types.INT8, 7).shape
        (7,)
        """
        return (self._size,)

    @property
    def nvals(self):
        """Number of stored elements.

        >>> Vector.from_lists([0, 2], [1, 2]).nvals
        2
        """
        self._flush()
        if self._nvals_c is None:
            if self._fmt == "iso":
                self._nvals_c = self._size
            elif self._fmt == "coo":
                self._nvals_c = int(self._idx_h.size)
            else:
                self._nvals_c = int(jnp.sum(self._mask))
        return self._nvals_c

    @property
    def memory_usage(self):
        """Bytes used by this vector's storage.

        >>> Vector.from_list([1, 2, 3]).memory_usage > 0
        True
        """
        self._flush()
        if self._fmt == "iso":
            return np.dtype(self.type._numpy_t).itemsize
        if self._fmt == "coo":
            return self._idx_h.nbytes + self._vals_h.nbytes
        return self._vals.nbytes + self._mask.nbytes

    @property
    def hyper_switch(self):
        """Hypersparsity switching threshold (parity knob, reference
        vector.py:402-417).

        >>> v = Vector.from_list([1, 2, 3])
        >>> v.hyper_switch = 0.5
        >>> v.hyper_switch
        0.5
        """
        return self._hyper_switch

    @hyper_switch.setter
    def hyper_switch(self, switch):
        self._hyper_switch = float(switch)

    @property
    def sparsity(self):
        """Sparsity control bitmask (reference vector.py:419-438);
        defaults to GxB_AUTO_SPARSITY (15).

        >>> v = Vector.from_list([1, 2, 3])
        >>> v.sparsity
        15
        >>> v.sparsity = 4
        >>> v.sparsity
        4
        """
        return self._sparsity

    @sparsity.setter
    def sparsity(self, sparsity):
        """Setting the control CONVERTS storage (cf. Matrix.sparsity):
        1|2 moves bitmap to sorted-COO; 4|8 moves COO to bitmap when
        the dense budget allows."""
        self._sparsity = int(sparsity)
        self._flush()
        wants_sparse = not (self._sparsity & 12)
        wants_dense = not (self._sparsity & 3)
        if wants_sparse and self._fmt == "bitmap":
            i, v = self._coo()
            self._fmt = "coo"
            self._vals = self._mask = None
            self._idx_h, self._vals_h = i, v
            self._invalidate()
        elif wants_dense and self._fmt == "coo" \
                and self._fits_bitmap(self._size, self.type):
            v, m = self._dense_pair()
            self._set_dense(v, m)

    @property
    def sparsity_status(self):
        """Current physical format: 1=hypersparse, 2=sparse, 4=bitmap,
        8=full (reference vector.py:440-447).

        >>> Vector.from_lists([0, 2], [7, 9], 4).sparsity_status
        4
        >>> Vector.from_list([1, 2, 3]).sparsity_status
        8
        >>> Vector.sparse(types.INT64, 10**12).sparsity_status
        1
        """
        self._flush()
        if self._fmt == "iso":
            return 8
        if self._fmt == "coo":
            return 1
        if self.nvals == self._size:
            return 8
        return 4

    @property
    def gb_type(self):
        """The GraphBLAS type object of the Vector.

        >>> Vector.from_list([1, 2, 3]).gb_type == types.INT64
        True
        """
        return self.type

    @property
    def indices(self):
        """Array of indices of stored elements.

        >>> list(Vector.from_lists([0, 2], [1, 2]).indices)
        [0, 2]
        """
        return array("L", map(int, self._coo()[0]))

    @property
    def I(self):
        """Iterator over `Vector.indices`.

        >>> v = Vector.from_lists([0, 2], [7, 9], 4)
        >>> list(v.I)
        [0, 2]
        """
        return iter(self.indices)

    @property
    def npI(self):
        """numpy array of indices.

        >>> Vector.from_lists([0, 2], [7, 9], 4).npI
        array([0, 2], dtype=uint64)
        """
        return self._coo()[0].astype(np.uint64)

    @property
    def vals(self):
        """Array of stored values.

        >>> list(Vector.from_lists([0, 2], [7, 9], 4).vals)
        [7, 9]
        """
        v = self._coo()[1]
        if self.type._typecode is None:
            return list(map(self.type._to_value, v))
        return array(self.type._typecode, map(self.type._to_value, v))

    @property
    def V(self):
        """Iterator over `Vector.vals`.

        >>> list(Vector.from_lists([0, 2], [7, 9], 4).V)
        [7, 9]
        """
        return iter(self.vals)

    @property
    def npV(self):
        """numpy array of stored values.

        >>> Vector.from_lists([0, 2], [7, 9], 4).npV
        array([7, 9])
        """
        return np.asarray(self._coo()[1])

    def pattern(self, typ=types.BOOL):
        """BOOL pattern vector of stored elements.

        >>> print(Vector.from_lists([0, 2], [1, 2]).pattern())
        0| t
        1|
        2| t
        """
        out = Vector.sparse(typ, self.size)
        return self.apply(typ.ONE, out=out)

    @property
    def S(self):
        """The vector structure; same as `Vector.pattern()`.

        >>> print(Vector.from_lists([0, 2], [7, 9], 3).S)
        0| t
        1|
        2| t
        """
        return self.pattern()

    # ------------------------------------------------------------------
    # lifecycle / element access
    # ------------------------------------------------------------------

    def dup(self):
        """Duplicate this Vector.

        >>> v = Vector.from_list([1, 2])
        >>> v.dup().iseq(v)
        True

        The duplicate is independent of the original:

        >>> w = v.dup()
        >>> w[0] = 9
        >>> v[0]
        1
        """
        out = Vector.sparse(self.type, self._size)
        self._flush()
        if self._fmt == "bitmap":
            out._set_dense(self._vals, self._mask)
        else:
            out._idx_h = self._idx_h.copy()
            out._vals_h = self._vals_h.copy()
            out._invalidate()
        return out

    def cast(self, cast, out=None):
        """Cast this vector to another type (cf. `Matrix.cast`,
        reference matrix.py:1063; vectors cast via apply-identity).

        >>> v = Vector.from_list([1, 2, 3])
        >>> w = v.cast(types.FP32)
        >>> w.type is types.FP32
        True
        >>> print(w)
        0|1.0
        1|2.0
        2|3.0
        """
        if out is None:
            out = Vector.sparse(cast, self._size)
        self._flush()
        if self._fmt == "bitmap" and out._fmt == "bitmap":
            v, m = self._dense_pair()
            out._set_dense(v.astype(out.type._jnp_dtype()), m)
        else:
            i, v = self._coo()
            out._idx_h = i.copy()
            out._vals_h = v.astype(out.type._numpy_t)
            out._invalidate()
        return out

    def clear(self):
        """Remove all elements.

        >>> v = Vector.from_list([1, 2, 3])
        >>> v.clear()
        >>> v.nvals
        0
        """
        self._pending = []
        if self._fmt == "bitmap":
            self._vals = jnp.zeros_like(self._vals)
            self._mask = jnp.zeros_like(self._mask)
        else:
            self._idx_h = np.empty(0, np.int64)
            self._vals_h = np.empty(0, self.type._numpy_t)
        self._invalidate()

    def resize(self, size=GxB_INDEX_MAX):
        """Resize; values beyond the new size are dropped.

        >>> v = Vector.from_list([1, 2, 3])
        >>> v.resize(10)
        >>> v.size
        10
        """
        i, v = self._coo()
        keep = i < size
        self._size = int(size)
        self._fmt = "bitmap" if self._fits_bitmap(size, self.type) else "coo"
        if self._fmt == "bitmap":
            self._vals = jnp.zeros((self._size,), self.type._jnp_dtype())
            self._mask = jnp.zeros((self._size,), jnp.bool_)
            self._idx_h = self._vals_h = None
        else:
            self._vals = self._mask = None
        self._invalidate()
        self._build(i[keep], v[keep])

    def wait(self):
        """Complete all pending work on this Vector.

        >>> v = Vector.sparse(types.INT64, 3)
        >>> v[1] = 7
        >>> v.wait()
        >>> v.nvals
        1
        """
        self._flush()
        if self._fmt == "bitmap":
            self._vals.block_until_ready()

    def __setitem__(self, index, value):
        """Write an element or region.

        >>> v = Vector.sparse(types.INT64, 3)
        >>> v[0] = 7
        >>> v[1:] = 9
        >>> print(v)
        0| 7
        1| 9
        2| 9
        """
        if _is_int(index):
            if not 0 <= index < self._size:
                raise InvalidIndex("index out of bounds")
            self._pending.append(
                (index, self.type._coerce(self.type._from_value(value))))
            self._invalidate()
            return
        if isinstance(index, slice):
            if isinstance(value, Vector):
                return self.assign(value, index)
            return self.assign_scalar(value, index)
        if isinstance(index, Vector):
            if isinstance(value, Vector):
                return self.assign(value, mask=index)
            return self.assign_scalar(value, mask=index)
        if isinstance(index, list):
            if isinstance(value, Vector):
                return self.assign(value, index)
            return self.assign_scalar(value, index)
        raise TypeError

    def __getitem__(self, index):
        """Read an element or sub-vector.

        >>> v = Vector.from_list([1, 2, 3])
        >>> v[1]
        2
        >>> print(v[0:1])
        0| 1
        1| 2
        """
        if _is_int(index):
            return self.extract_element(index)
        if not isinstance(index, (slice, list, np.ndarray, Vector)):
            raise TypeError(f"bad Vector index: {type(index)}")
        return self.extract(index)

    def __delitem__(self, index):
        """Remove a single stored element.

        >>> v = Vector.from_lists([0, 2], [7, 9], 3)
        >>> del v[0]
        >>> v.to_lists()
        [[2], [9]]
        """
        if not _is_int(index):
            raise TypeError("only single element removal supported")
        self._flush()
        if self._fmt == "coo":
            self._idx_h, _, self._vals_h, _ = ck.remove(
                self._idx_h, np.zeros_like(self._idx_h), self._vals_h,
                index, 0)
        else:
            self._mask = self._mask.at[index].set(False)
            self._vals = self._vals.at[index].set(0)
        self._invalidate()

    def __contains__(self, index):
        """True iff an element is stored at `index`.

        >>> v = Vector.from_lists([0, 2], [7, 9], 3)
        >>> 0 in v
        True
        >>> 1 in v
        False
        """
        try:
            self[index]
            return True
        except NoValue:
            return False

    def get(self, i, default=None):
        """Element at i or `default`.

        >>> Vector.from_lists([0], [42], 2).get(1, 'foo')
        'foo'
        """
        try:
            return self[i]
        except NoValue:
            return default

    def extract_element(self, index):
        """Extract a single element; raises NoValue if absent.

        >>> v = Vector.from_lists([0, 2], [7, 9], 3)
        >>> v.extract_element(2)
        9
        """
        if not 0 <= index < self._size:
            raise InvalidIndex("index out of bounds")
        self._flush()
        if self._fmt == "iso":
            return self.type._to_value(self._iso_v)
        if self._fmt == "coo":
            pos = ck.find(self._idx_h, np.zeros_like(self._idx_h), index, 0)
            if pos < 0:
                raise NoValue
            return self.type._to_value(self._vals_h[pos])
        v, m = self._host_pair()
        if not m[index]:
            raise NoValue
        return self.type._to_value(v[index])

    def extract(self, index, mask=None, accum=None, desc=None):
        """Extract a sub-vector by slice or index list.

        >>> v = Vector.from_list([1, 2, 3])
        >>> print(v.extract(slice(1, 2)))
        0| 2
        1| 3
        >>> print(v.extract([0, 2]))
        0| 1
        1| 3
        >>> print(v.extract(slice(2, 0, -1)))
        0| 3
        1| 2
        2| 1
        """
        mask, accum, desc = self._get_args(mask, accum, desc)
        iset = _build_range(index if not _is_int(index)
                            else slice(index, index), self._size - 1)
        if iset.size is None:
            iset.size = self._size
        out = Vector.sparse(self.type, iset.size)
        if not self._fits_bitmap(self._size, self.type):
            from .core import coosem as cs

            i, v = self._coo()
            ent, pos = cs.selector(iset, self._size).select(i)
            order = np.argsort(pos, kind="stable")
            return out._coo_writeback(out, pos[order], v[ent][order],
                                      mask, accum, desc)
        I = np.asarray(iset.indices(self._size), np.int64)
        v, m = self._dense_pair()
        idx = jnp.asarray(I)
        return out._writeback(out, v[idx], m[idx], mask, accum, desc)

    def __iter__(self):
        """Iterate (index, value) pairs.

        >>> list(iter(Vector.from_lists([0, 2], [1, 2])))
        [(0, 1), (2, 2)]
        """
        i, v = self._coo()
        return zip(map(int, i), map(self.type._to_value, v))

    def to_lists(self):
        """Return [indices, values] lists.

        >>> Vector.from_lists([0, 2], [1, 2]).to_lists()
        [[0, 2], [1, 2]]
        """
        i, v = self._coo()
        return [list(map(int, i)), list(map(self.type._to_value, v))]

    def to_arrays(self):
        """Return (indices, values) as stdlib arrays.

        >>> Vector.from_lists([0, 2], [1, 2]).to_arrays()
        (array('L', [0, 2]), array('q', [1, 2]))
        """
        if self.type._typecode is None:
            raise TypeError("This vector has no array typecode.")
        i, v = self._coo()
        return (array("L", map(int, i)),
                array(self.type._typecode, map(self.type._to_value, v)))

    def to_numpy(self):
        """Dense numpy copy.

        >>> Vector.from_lists([0, 2], [7, 9], 3).to_numpy()
        array([7, 0, 9])
        """
        v, m = self._host_pair()
        return np.where(m, v, np.zeros((), v.dtype))

    # ------------------------------------------------------------------
    # rendering
    # ------------------------------------------------------------------

    def to_string(self, format_string="{:>%s}", width=2, prec=3,
                  empty_char=""):
        """String rendering (same layout as reference vector.py:1595).

        >>> Vector.from_lists([0, 2], [1, 2]).to_string()
        '0| 1\\n1|\\n2| 2'
        """
        format_string = format_string % width
        result = ""
        for row in range(self.size):
            value = self.get(row, empty_char)
            result += str(row) + "|"
            result += format_string.format(
                self.type.format_value(value, width, prec)).rstrip()
            if row < self.size - 1:
                result += "\n"
        return result

    def __str__(self):
        return self.to_string()

    def __repr__(self):
        tname = self.type.__name__
        if self._size == GxB_INDEX_MAX:
            return f"<Vector({tname}, nvals: {self.nvals})>"
        return f"<Vector({tname} size: {self.size}, nvals: {self.nvals})>"

    def print(self, level=2, name="v", f=None):  # pragma: no cover
        import sys

        f = f or sys.stdout
        print(f"GraphBLAS Vector {name}: {self.type.__name__} "
              f"size={self.size} nvals={self.nvals}", file=f)
        if level >= 3:
            print(self.to_string(), file=f)

    # ------------------------------------------------------------------
    # element-wise / apply / select
    # ------------------------------------------------------------------

    def _resolve_eop(self, op, for_eadd):
        if op is None:
            op = current_binop.get(None)
            if op is None:
                op = current_monoid.get(None)
        if isinstance(op, str):
            op = _get_bin_op(op, self.type)
        if isinstance(op, Semiring):
            op = op.add_monoid.binaryop if for_eadd else op.mul_op
        if isinstance(op, Monoid):
            op = op.binaryop
        return op

    @_timed("Vector.eadd")
    def eadd(self, other, add_op=None, cast=None, out=None, mask=None,
             accum=None, desc=None):
        """Element-wise union.

        >>> u = Vector.from_lists([0, 1], [1, 2], 3)
        >>> v = Vector.from_lists([1, 2], [10, 20], 3)
        >>> print(u.eadd(v))
        0| 1
        1|12
        2|20
        >>> print(u.eadd(v, types.INT64.MAX))
        0| 1
        1|10
        2|20
        """
        add_op = self._resolve_eop(add_op, True)
        mask, accum, desc = self._get_args(mask, accum, desc)
        if out is None:
            typ = cast or promote(self.type, other.type)
            out = Vector.sparse(typ, self.size)
        if add_op is None:
            add_op = out.type._default_addop()
        if self.size != other.size:
            raise DimensionMismatch("eadd size mismatch")
        if not self._fits_bitmap(self.size, self.type):
            return self._ewise_huge(other, add_op, out, mask, accum, desc,
                                    union=True)
        av, am = self._dense_pair()
        bv, bm = other._dense_pair()
        tv, tm = dk.eadd(av, am, bv, bm, add_op, out.type._jnp_dtype())
        return self._writeback(out, tv, tm, mask, accum, desc)

    union = eadd

    @_timed("Vector.emult")
    def emult(self, other, mult_op=None, cast=None, out=None, mask=None,
              accum=None, desc=None):
        """Element-wise intersection.

        >>> u = Vector.from_lists([0, 1], [1, 2], 3)
        >>> v = Vector.from_lists([1, 2], [10, 20], 3)
        >>> print(u.emult(v))
        0|
        1|20
        2|
        >>> print(u.emult(v, '+'))
        0|
        1|12
        2|
        """
        mult_op = self._resolve_eop(mult_op, False)
        mask, accum, desc = self._get_args(mask, accum, desc)
        if out is None:
            typ = cast or promote(self.type, other.type)
            out = Vector.sparse(typ, self.size)
        if mult_op is None:
            mult_op = out.type._default_multop()
        if self.size != other.size:
            raise DimensionMismatch("emult size mismatch")
        if not self._fits_bitmap(self.size, self.type):
            return self._ewise_huge(other, mult_op, out, mask, accum,
                                    desc, union=False)
        av, am = self._dense_pair()
        bv, bm = other._dense_pair()
        ztype = mult_op.ztype(self.type)
        tv, tm = dk.emult(av, am, bv, bm, mult_op, ztype._jnp_dtype())
        return self._writeback(out, tv, tm, mask, accum, desc)

    intersection = emult

    def all(self, other, op):
        """True iff same size/pattern and op holds for all matched values.

        >>> v = Vector.from_list([1, 2, 3])
        >>> v.all(Vector.from_list([1, 2, 3]), types.INT64.EQ)
        True
        >>> v.all(Vector.from_list([1, 2, 4]), types.INT64.LE)
        True
        """
        if self.size != other.size:
            return False
        if self.nvals != other.nvals:
            return False
        C = self.emult(other, op, cast=types.BOOL)
        if C.nvals != self.nvals:
            return False
        return C.reduce_bool(types.BOOL.LAND_MONOID)

    def iseq(self, other, eq_op=None):
        """True iff structurally and numerically equal.

        >>> v = Vector.from_list([1, 2])
        >>> v.iseq(v.dup())
        True
        >>> v.iseq(Vector.from_list([1, 3]))
        False
        """
        if eq_op is None:
            if self.type != other.type:
                return False
            eq_op = self.type.EQ
        return self.all(other, eq_op)

    def isne(self, other):
        """Not `iseq`.

        >>> v = Vector.from_list([1, 2])
        >>> v.isne(Vector.from_list([1, 3]))
        True
        >>> v.isne(v)
        False
        """
        return not self.iseq(other)

    @_timed("Vector.apply")
    def apply(self, op, out=None, mask=None, accum=None, desc=None):
        """Apply a unary operator to every element.

        >>> print(Vector.from_list([-1, 2]).apply(types.INT64.AINV))
        0| 1
        1|-2
        >>> print(Vector.from_list([-1, 2]).apply(types.INT64.ABS))
        0| 1
        1| 2
        """
        if isinstance(op, _pytypes.FunctionType):
            from .unaryop import UnaryOp

            op = UnaryOp(op.__name__, self.type.__name__, fn=op, attach=False)
        mask, accum, desc = self._get_args(mask, accum, desc)
        ztype = op.ztype(self.type)
        if out is None:
            out = Vector.sparse(ztype, self.size)
        if not self._fits_bitmap(self.size, self.type):
            i, v = self._coo()
            if op.positional:
                pos = dict(i=jnp.asarray(i), j=jnp.asarray(i))
                nv = op.apply(None, pos)
            else:
                nv = op.apply(jnp.asarray(v))
            return self._coo_writeback(
                out, i, np.asarray(nv).astype(out.type._numpy_t),
                mask, accum, desc)
        v, m = self._dense_pair()
        tv, tm = dk.apply_unary(v, m, op, ztype._jnp_dtype())
        return self._writeback(out, tv, tm, mask, accum, desc)

    def apply_first(self, first, op, out=None, mask=None, accum=None,
                    desc=None):
        """Binary op with bound first scalar operand.

        >>> print(Vector.from_list([1, 2]).apply_first(10, types.INT64.MINUS))
        0| 9
        1| 8
        """
        mask, accum, desc = self._get_args(mask, accum, desc)
        if isinstance(first, Scalar):
            first = first[0]
        ztype = op.ztype(self.type)
        if out is None:
            out = Vector.sparse(ztype, self.size)
        if not self._fits_bitmap(self.size, self.type):
            return self._apply_bound_sparse(op, first, True, out, mask,
                                            accum, desc)
        v, m = self._dense_pair()
        tv, tm = dk.apply_binary_bound(v, m, self.type._coerce(first), op,
                                       ztype._jnp_dtype(), True)
        return self._writeback(out, tv, tm, mask, accum, desc)

    def apply_second(self, op, second, out=None, mask=None, accum=None,
                     desc=None):
        """Binary op with bound second scalar operand.

        >>> print(Vector.from_list([1, 2]).apply_second(types.INT64.MINUS, 10))
        0|-9
        1|-8
        """
        mask, accum, desc = self._get_args(mask, accum, desc)
        if isinstance(second, Scalar):
            second = second[0]
        ztype = op.ztype(self.type)
        if out is None:
            out = Vector.sparse(ztype, self.size)
        if not self._fits_bitmap(self.size, self.type):
            return self._apply_bound_sparse(op, second, False, out, mask,
                                            accum, desc)
        v, m = self._dense_pair()
        tv, tm = dk.apply_binary_bound(v, m, self.type._coerce(second), op,
                                       ztype._jnp_dtype(), False)
        return self._writeback(out, tv, tm, mask, accum, desc)

    def _apply_bound_sparse(self, op, scalar, bind_first, out, mask,
                            accum, desc):
        i, v = self._coo()
        sc = jnp.asarray(self.type._coerce(scalar))
        vj = jnp.asarray(v)
        if op.positional:
            pos = dict(i0=jnp.asarray(i), j0=jnp.asarray(i),
                       i1=jnp.asarray(i), j1=jnp.asarray(i))
            z = op.apply(vj, vj, pos)
        elif bind_first:
            z = op.apply(sc.astype(vj.dtype), vj)
        else:
            z = op.apply(vj, sc.astype(vj.dtype))
        return self._coo_writeback(
            out, i, np.asarray(z).astype(out.type._numpy_t),
            mask, accum, desc)

    @_timed("Vector.select")
    def select(self, op, thunk=None, out=None, mask=None, accum=None,
               desc=None):
        """Select elements matching a predicate (same string table as
        `Matrix.select`).

        >>> v = Vector.from_lists([0, 1, 2], [-1, 0, 1])
        >>> print(v.select('>0'))
        0|
        1|
        2| 1
        >>> v.select('<0').nvals
        1
        >>> print(v.select('>', 0))
        0|
        1|
        2| 1
        """
        if out is None:
            out = Vector.sparse(self.type, self.size)
        if isinstance(op, str):
            if op == "min":
                thunk = self.reduce_float(self.type.min_monoid)
                op = _get_select_op("==")
            elif op == "max":
                thunk = self.reduce_float(self.type.max_monoid)
                op = _get_select_op("==")
            else:
                op = _get_select_op(op)
        elif isinstance(op, _pytypes.FunctionType):
            op = SelectOp(op.__name__, op, needs_thunk=True)
        if isinstance(thunk, Scalar):
            thunk = thunk[0]
        if thunk is None:
            thunk = DEFAULT_THUNKS.get(op.name) or 0
        mask, accum, desc = self._get_args(mask, accum, desc)
        if not self._fits_bitmap(self.size, self.type):
            i, v = self._coo()
            keep = np.asarray(op.apply(jnp.asarray(i), jnp.asarray(i),
                                       jnp.asarray(v),
                                       self.type._coerce(thunk)))
            return self._coo_writeback(
                out, i[keep], v[keep].astype(out.type._numpy_t),
                mask, accum, desc)
        v, m = self._dense_pair()
        tv, tm = dk.select(v, m, self.type._coerce(thunk), op)
        return self._writeback(out, tv, tm, mask, accum, desc)

    def nonzero(self):
        """Select the non-zero entries.

        >>> print(Vector.from_lists([0, 1, 2], [1, 0, 3], 3).nonzero())
        0| 1
        1|
        2| 3
        """
        from . import selectop

        return self.select(selectop.NONZERO)

    # ------------------------------------------------------------------
    # reductions
    # ------------------------------------------------------------------


    def _reduce_pair(self):
        """(vals, mask) arrays for scalar reductions: the dense pair, or
        the COO value vector for huge vectors (every stored value
        present)."""
        if not self._fits_bitmap(self._size, self.type):
            _, v = self._coo()
            if v.size:
                return jnp.asarray(v), jnp.ones((v.size,), jnp.bool_)
            return (jnp.zeros((1,), self.type._jnp_dtype()),
                    jnp.zeros((1,), jnp.bool_))
        return self._dense_pair()

    def _iso_reduce(self, mon):
        """Closed-form fold of an O(1) iso vector (n copies of one value)
        for the standard monoids; None when not applicable.  Keeps
        ``Vector.iso(...).reduce()`` O(1) at any size (advisor r2 low)."""
        self._flush()
        if self._fmt != "iso":
            return None
        op = mon.binaryop.op
        v = self._iso_v
        n = self._size
        if op in ("MIN", "MAX", "ANY", "LOR", "LAND", "BOR", "BAND"):
            return v  # idempotent
        npdt = np.dtype(self.type._numpy_t)

        def _wrap(r):
            bits = npdt.itemsize * 8
            r %= 1 << bits
            if npdt.kind == "i" and r >= 1 << (bits - 1):
                r -= 1 << bits
            return npdt.type(r)

        if op == "PLUS":
            if npdt.kind in "iu":
                return _wrap(int(v) * n)
            return npdt.type(v * n)
        if op == "TIMES":
            if npdt.kind in "iu":
                return _wrap(pow(int(v), n, 1 << (npdt.itemsize * 8)))
            return npdt.type(np.float64(v) ** n)
        if op in ("LXOR", "BXOR"):
            return npdt.type(v if n % 2 else 0)
        return None

    @_timed("Vector.reduce")
    def reduce(self, mon=None, accum=None, desc=None):
        """Type-generic reduce to a scalar of this vector's type.

        >>> Vector.from_list([1, 2, 3]).reduce()
        6
        >>> Vector.from_list([1, 2, 3]).reduce(types.INT64.MIN_MONOID)
        1
        """
        if mon is None:
            mon = current_monoid.get(None)
            if mon is None:
                mon = getattr(self.type,
                              self.type._default_addop().op + "_MONOID")
        _, accum, desc = self._get_args(None, accum, desc)
        if getattr(self.type, "member_def", None):
            # struct UDT: identity-free pairwise tree fold on the host
            _, v = self._coo()
            if len(v) == 0:
                raise NoValue
            while len(v) > 1:
                k = (len(v) // 2) * 2
                merged = np.asarray(mon.apply(v[0:k:2], v[1:k:2]))
                v = (merged if k == len(v)
                     else np.concatenate([merged, v[k:]]))
            return self.type._to_value(v[0])
        from .matrix import _reduce_accum
        iso_r = self._iso_reduce(mon)
        if iso_r is not None:
            return self.type._to_value(
                np.asarray(_reduce_accum(accum, np.asarray(iso_r),
                                         self.type._numpy_t))
                .astype(self.type._numpy_t))
        v, m = self._reduce_pair()
        r = np.asarray(dk.reduce_all(v, m, mon)).astype(self.type._numpy_t)
        return self.type._to_value(
            np.asarray(_reduce_accum(accum, r, self.type._numpy_t))
            .astype(self.type._numpy_t))

    def reduce_bool(self, mon=None, mask=None, accum=None, desc=None):
        """Reduce to a bool (default LOR monoid).

        >>> Vector.from_list([False, True]).reduce_bool()
        True
        """
        if mon is None:
            mon = current_monoid.get(None) or types.BOOL.LOR_MONOID
        _, accum, desc = self._get_args(None, accum, desc)
        from .matrix import _reduce_accum
        iso_r = self._iso_reduce(mon)
        if iso_r is not None:
            return bool(_reduce_accum(accum, np.bool_(iso_r), np.bool_))
        v, m = self._reduce_pair()
        r = dk.reduce_all(
            v if v.dtype == jnp.bool_ else v.astype(jnp.bool_), m, mon)
        return bool(_reduce_accum(accum, r, np.bool_))

    def reduce_int(self, mon=None, mask=None, accum=None, desc=None):
        """Reduce to an int (default PLUS monoid).

        >>> Vector.from_list([1, 2, 3]).reduce_int()
        6
        """
        if mon is None:
            mon = current_monoid.get(None) or types.INT64.PLUS_MONOID
        _, accum, desc = self._get_args(None, accum, desc)
        from .matrix import _reduce_accum
        iso_r = self._iso_reduce(mon)
        if iso_r is not None:
            return int(_reduce_accum(accum, np.int64(iso_r), np.int64))
        v, m = self._reduce_pair()
        r = dk.reduce_all(v.astype(jnp.int64), m, mon)
        return int(_reduce_accum(accum, r, np.int64))

    def reduce_float(self, mon=None, mask=None, accum=None, desc=None):
        """Reduce to a float (default PLUS monoid).

        >>> Vector.from_list([1.5, 2.5]).reduce_float()
        4.0
        """
        if mon is None:
            mon = current_monoid.get(None) or self.type.PLUS_MONOID
        _, accum, desc = self._get_args(None, accum, desc)
        from .matrix import _reduce_accum
        iso_r = self._iso_reduce(mon)
        if iso_r is not None:
            return float(_reduce_accum(accum, np.float64(iso_r),
                                       np.float64))
        v, m = self._reduce_pair()
        r = dk.reduce_all(v.astype(jnp.float64), m, mon)
        return float(_reduce_accum(accum, r, np.float64))

    def max(self):
        """Maximum stored value.

        >>> Vector.from_lists([0, 1, 2], [-42, 0, 149]).max()
        149
        """
        if self.type == types.BOOL:
            return self.reduce_bool(self.type.LOR_MONOID)
        if self.type in types._int_types:
            return self.reduce_int(self.type.MAX_MONOID)
        if self.type in types._float_types:
            return self.reduce_float(self.type.MAX_MONOID)
        raise TypeError("Un-maxable type")

    def min(self):
        """Minimum stored value.

        >>> Vector.from_lists([0, 1, 2], [-42, 0, 149]).min()
        -42
        """
        if self.type == types.BOOL:
            return self.reduce_bool(self.type.LAND_MONOID)
        if self.type in types._int_types:
            return self.reduce_int(self.type.MIN_MONOID)
        if self.type in types._float_types:
            return self.reduce_float(self.type.MIN_MONOID)
        raise TypeError("Un-minable type")

    # ------------------------------------------------------------------
    # vxm
    # ------------------------------------------------------------------

    @_timed("Vector.vxm")
    def vxm(self, other, semiring=None, cast=None, out=None, mask=None,
            accum=None, desc=None):
        """Vector-matrix multiply ("on the left").

        >>> from .matrix import Matrix
        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [1, 2, 3])
        >>> v = Vector.from_lists([0, 1, 2], [2, 3, 4])
        >>> print(v.vxm(M))
        0|12
        1| 2
        2| 6

        ``v @ M`` is the operator spelling:

        >>> print(v @ M)
        0|12
        1| 2
        2| 6
        """
        from .matrix import Matrix

        if semiring is None:
            semiring = current_semiring.get(None)
        mask, accum, desc = self._get_args(mask, accum, desc)
        # T1 transposes the matrix argument
        bnrows = other.ncols if desc.inp1 else other.nrows
        bncols = other.nrows if desc.inp1 else other.ncols
        if self.size != bnrows:
            raise DimensionMismatch(f"vxm: {self.size} != {bnrows}")
        if out is None:
            if semiring is not None:
                typ = semiring.ztype
            else:
                typ = cast or promote(self.type, other.type)
            out = Vector.sparse(typ, bncols)
        if semiring is None:
            semiring = out.type._default_semiring()
        if other._fmt == "coo" and not Matrix._fits_bitmap(
                other.nrows, other.ncols, other.type):
            # vxm: the multiply's FIRST operand is the vector element
            return other._sparse_mxv(self, semiring, out, mask, accum, desc,
                                     transpose=not desc.inp1, flip_mul=True)
        bv, bm = other._dense_pair(desc.inp1)
        xv, xm = self._dense_pair()
        tv, tm = dk.mxm(xv[None, :], xm[None, :], bv, bm, semiring,
                        np.dtype(semiring.ztype._numpy_t))
        return self._writeback(out, tv[0, :], tm[0, :], mask, accum, desc)

    def __matmul__(self, other):
        return self.vxm(other)

    def __imatmul__(self, other):
        return self.vxm(other, out=self)

    # ------------------------------------------------------------------
    # operator overloads
    # ------------------------------------------------------------------

    def __getattr__(self, name):
        """Look up operators as attributes: v.min_plus(M), v.ainv()."""
        try:
            attr = getattr(self.type, name)
        except AttributeError:
            raise AttributeError(
                f"Vector has no attribute or type operator {name}")
        return partial(attr, self)

    def __len__(self):
        """Number of stored elements."""
        return self.nvals

    def __and__(self, other):
        op = current_binop.get(self.type.SECOND)
        return self.emult(other, op)

    def __iand__(self, other):
        op = current_binop.get(self.type.SECOND)
        return self.emult(other, op, out=self)

    def __or__(self, other):
        op = current_binop.get(self.type.SECOND)
        return self.eadd(other, op)

    def __ior__(self, other):
        op = current_binop.get(self.type.SECOND)
        return self.eadd(other, op, out=self)

    def __add__(self, other):
        """eadd with PLUS; a scalar operand binds apply_second.

        >>> v = Vector.from_list([1, 2, 3])
        >>> print(v + 1)
        0| 2
        1| 3
        2| 4
        """
        op = current_binop.get(self.type.PLUS)
        if not isinstance(other, Vector):
            return self.apply_second(op, other)
        return self.eadd(other, op)

    def __radd__(self, other):
        op = current_binop.get(self.type.PLUS)
        if not isinstance(other, Vector):
            return self.apply_first(other, op)
        return other.eadd(self, op)  # pragma: no cover

    def __iadd__(self, other):
        op = current_binop.get(self.type.PLUS)
        if not isinstance(other, Vector):
            return self.apply_second(op, other, out=self)
        return self.eadd(other, op, out=self)

    def __sub__(self, other):
        op = current_binop.get(self.type.MINUS)
        if not isinstance(other, Vector):
            return self.apply_second(op, other)
        return self.eadd(other, op)

    def __rsub__(self, other):
        op = current_binop.get(self.type.MINUS)
        if not isinstance(other, Vector):
            return self.apply_first(other, op)
        return other.eadd(self, op)  # pragma: no cover

    def __isub__(self, other):
        op = current_binop.get(self.type.MINUS)
        if not isinstance(other, Vector):
            return self.apply_second(op, other, out=self)
        return self.eadd(other, op, out=self)

    def __mul__(self, other):
        """emult with TIMES; a scalar operand binds apply_second.

        >>> v = Vector.from_list([1, 2, 3])
        >>> print(v * v)
        0| 1
        1| 4
        2| 9
        """
        op = current_binop.get(self.type.TIMES)
        if not isinstance(other, Vector):
            return self.apply_second(op, other)
        return self.emult(other, op)

    def __rmul__(self, other):
        op = current_binop.get(self.type.TIMES)
        if not isinstance(other, Vector):
            return self.apply_first(other, op)
        return other.emult(self, op)  # pragma: no cover

    def __imul__(self, other):
        op = current_binop.get(self.type.TIMES)
        if not isinstance(other, Vector):
            return self.apply_second(op, other, out=self)
        return self.emult(other, op, out=self)

    def __truediv__(self, other):
        op = current_binop.get(self.type.DIV)
        if not isinstance(other, Vector):
            return self.apply_second(op, other)
        return self.emult(other, op)

    def __rtruediv__(self, other):
        op = current_binop.get(self.type.DIV)
        if not isinstance(other, Vector):
            return self.apply_first(other, op)
        return other.emult(self, op)  # pragma: no cover

    def __itruediv__(self, other):
        op = current_binop.get(self.type.DIV)
        if not isinstance(other, Vector):
            return self.apply_second(op, other, out=self)
        return self.emult(other, op, out=self)

    def __invert__(self):
        return self.apply(self.type.MINV)

    def __neg__(self):
        """Additive inverse of every element.

        >>> print(-Vector.from_list([1, -2]))
        0|-1
        1| 2
        """
        return self.apply(self.type.AINV)

    def __abs__(self):
        """Absolute value of every element.

        >>> print(abs(Vector.from_list([-1, 2])))
        0| 1
        1| 2
        """
        return self.apply(self.type.ABS)

    # ------------------------------------------------------------------
    # comparison operators
    # ------------------------------------------------------------------

    def _full(self):
        B = self.__class__.sparse(self.type, self.size)
        B.assign_scalar(self.type.default_one)
        return self.eadd(B, self.type.FIRST)

    def _compare(self, other, op, strop):
        C = self.__class__.sparse(types.BOOL, self.size)
        if _is_scalar(other):
            if op(other, 0):
                B = self.__class__.dup(self)
                B[:] = other
                self.emult(B, strop, out=C)
                return C
            else:
                self.select(strop, other).apply(types.BOOL.ONE, out=C)
                return C
        elif isinstance(other, Vector):
            A = self._full()
            B = other._full()
            A.emult(B, strop, out=C)
            return C
        else:
            raise TypeError("Unknown vector comparison type.")

    def __gt__(self, other):
        return self._compare(other, operator.gt, ">")

    def __lt__(self, other):
        return self._compare(other, operator.lt, "<")

    def __ge__(self, other):
        return self._compare(other, operator.ge, ">=")

    def __le__(self, other):
        return self._compare(other, operator.le, "<=")

    def __eq__(self, other):
        return self._compare(other, operator.eq, "==")

    def __ne__(self, other):
        return self._compare(other, operator.ne, "!=")

    __hash__ = None

    # ------------------------------------------------------------------
    # assign
    # ------------------------------------------------------------------

    @_timed("Vector.assign")
    def assign(self, value, index=None, mask=None, accum=None, desc=None):
        """Assign a sub-vector (GrB_Vector_assign parity).

        >>> v = Vector.sparse(types.INT64, 3)
        >>> v.assign(Vector.from_list([9, 8, 7]))
        >>> print(v)
        0| 9
        1| 8
        2| 7

        A slice (stop-inclusive) assigns into part of the vector:

        >>> w = Vector.from_list([1, 2, 3])
        >>> w.assign(Vector.from_list([8, 9]), slice(1, 2))
        >>> print(w)
        0| 1
        1| 8
        2| 9
        """
        mask, accum, desc = self._get_args(mask, accum, desc)
        iset = _build_range(index if not _is_int(index)
                            else slice(index, index), self._size - 1)
        if iset.size is None:
            iset.size = self._size
        if iset.size != value.size:
            raise DimensionMismatch("assign length mismatch")
        if not self._fits_bitmap(self._size, self.type):
            from .core import coosem as cs
            from .matrix import Matrix as _M

            self._flush()
            ti, tv = value._coo()
            if iset.kind == "all" and iset.size == self._size:
                self._coo_writeback(self, ti,
                                    tv.astype(self.type._numpy_t),
                                    mask, accum, desc)
                return
            ci, cv = self._coo()
            mpi, _ = self._mask_pair_set(mask, desc)
            accum_fn = _M._np_binop(accum) if accum is not None else None
            z = np.zeros_like
            nr, _, nv = cs.assign_region(
                ci, z(ci), cv, ti, z(ti), tv.astype(self.type._numpy_t),
                cs.selector(iset, self._size), cs.ArithSelector(0, 1, 1),
                mpi, z(mpi) if mpi is not None else None,
                accum_fn, desc.complement, desc.replace,
                self.type._numpy_t)
            self._set_coo(nr, nv)
            return
        I = np.asarray(iset.indices(self._size), np.int64)
        self._flush()
        xv, xm = value._dense_pair()
        if len(I) == self._size and np.array_equal(I, np.arange(self._size)):
            self._writeback(self, xv.astype(self.type._jnp_dtype()), xm,
                            mask, accum, desc)
            return
        v, m = self._dense_pair()
        idx = jnp.asarray(I)
        sub_v, sub_m = v[idx], m[idx]
        mv, mm = (None, None)
        if mask is not None:
            mv, mm = mask._dense_pair()
            if mv.shape[0] == self._size:
                mv, mm = mv[idx], mm[idx]
        nv, nm = dk.writeback(sub_v, sub_m, xv.astype(v.dtype), xm, mv, mm,
                              accum=accum, complement=desc.complement,
                              structural=desc.structural,
                              replace=desc.replace)
        self._set_dense(v.at[idx].set(nv), m.at[idx].set(nm))

    @_timed("Vector.assign_scalar")
    def assign_scalar(self, value, index=None, mask=None, accum=None,
                      desc=None):
        """Assign a scalar to a region of the Vector.

        >>> v = Vector.sparse(types.INT64, 3)
        >>> v.assign_scalar(42)
        >>> print(v)
        0|42
        1|42
        2|42

        With a mask, only the mask's pattern is written:

        >>> w = Vector.sparse(types.INT64, 3)
        >>> m = Vector.from_lists([0, 2], [True, True], 3)
        >>> w.assign_scalar(5, mask=m)
        >>> print(w)
        0| 5
        1|
        2| 5
        """
        mask, accum, desc = self._get_args(mask, accum, desc)
        iset = _build_range(index if not _is_int(index)
                            else slice(index, index), self._size - 1)
        if iset.size is None:
            iset.size = self._size
        if not self._fits_bitmap(self._size, self.type):
            return self._assign_scalar_sparse(value, iset, mask, accum,
                                              desc)
        self._flush()
        v, m = self._dense_pair()
        if iset.kind == "all":
            tv = jnp.full((self._size,), self.type._coerce(value), v.dtype)
            tm = jnp.ones((self._size,), jnp.bool_)
            self._writeback(self, tv, tm, mask, accum, desc)
            return
        I = np.asarray(iset.indices(self._size), np.int64)
        tv = jnp.full((len(I),), self.type._coerce(value), v.dtype)
        tm = jnp.ones((len(I),), jnp.bool_)
        idx = jnp.asarray(I)
        sub_v, sub_m = v[idx], m[idx]
        mv, mm = (None, None)
        if mask is not None:
            mv, mm = mask._dense_pair()
            if mv.shape[0] == self._size:
                mv, mm = mv[idx], mm[idx]
        nv, nm = dk.writeback(sub_v, sub_m, tv, tm, mv, mm,
                              accum=accum, complement=desc.complement,
                              structural=desc.structural,
                              replace=desc.replace)
        self._set_dense(v.at[idx].set(nv), m.at[idx].set(nm))
