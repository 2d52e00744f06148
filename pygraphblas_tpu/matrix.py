"""The GraphBLAS Matrix container, TPU-native.

A Matrix is a 2-D sparse array over a GraphBLAS :class:`~.types.Type`.
Physically it lives in one of two formats, auto-selected by dimension
(mirroring SuiteSparse's sparsity-control design, reference
``matrix.py:836-885``):

- **bitmap/full**: device arrays ``(vals, mask)`` — all operations are
  fused XLA vector ops; semiring matmuls ride the MXU.
- **hypersparse COO**: host-staged sorted triples for matrices with huge
  logical dimensions (up to ``GxB_INDEX_MAX = 2^60``), shipped to the
  device as index arrays for sparse kernels (SpMV et al).

Single-element writes are staged in a pending-tuple buffer and flushed in
one vectorized scatter on the next read — the TPU analog of SuiteSparse's
pending-tuple/nonblocking model (reference ``matrix.py:3348``).

API surface and semantics follow the reference ``pygraphblas/matrix.py``
(method-by-method citations inline).
"""

import operator
import os
import random as _stdlib_random
import types as _pytypes
from array import array
from functools import partial
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from .base import (
    NULL,
    _timed,
    GxB_INDEX_MAX,
    GraphBLASException,
    NoValue,
    DimensionMismatch,
    InsufficientSpace,
    InvalidValue,
    InvalidIndex,
    _build_range,
    _get_bin_op,
    _get_select_op,
    IndexSet,
    config,
    burble,
    BY_ROW,
)
from . import types
from .types import promote, _gb_from_type, _type_from_value
from .binaryop import BinaryOp, current_accum, current_binop
from .monoid import Monoid, current_monoid
from .semiring import Semiring, current_semiring
from .selectop import SelectOp, DEFAULT_THUNKS
from .descriptor import Descriptor, Default, T0, current_desc
from .scalar import Scalar
from .core import dense as dk
from .core import coosparse as ck
from .core import coosem as cs
from .core import dewise as dw

__all__ = ["Matrix"]


def _is_scalar(x):
    return isinstance(x, (bool, int, float, complex, np.generic))


def _is_int(x):
    return isinstance(x, (int, np.integer)) and not isinstance(x, bool)


def _reduce_accum(accum, value, np_dtype):
    """Scalar-reduction accumulator semantics (reference
    matrix.py:1759-1858): GrB_reduce with an accum combines the reduction
    into the zero-initialized result scalar: r = accum(0, reduce(A))."""
    if accum is None:
        return value
    accum = accum.get_op() if hasattr(accum, "get_op") else accum
    z = np.zeros((), np_dtype)
    r = np.asarray(value).astype(np_dtype)
    return np.asarray(accum.apply(jnp.asarray(z), jnp.asarray(r)))


class Matrix:
    """GraphBLAS Matrix.

    Create with one of the constructor classmethods: `Matrix.sparse`,
    `Matrix.dense`, `Matrix.iso`, `Matrix.from_lists`, `Matrix.from_mm`,
    `Matrix.random`, `Matrix.identity`, ...
    """

    __slots__ = (
        "type",
        "_nrows",
        "_ncols",
        "_fmt",         # "bitmap" | "coo"
        "_vals",        # bitmap: jnp (m, n)
        "_mask",        # bitmap: jnp bool (m, n)
        "_rows_h",      # coo: np.int64 sorted
        "_cols_h",
        "_vals_h",
        "_pending",     # list[(i, j, v)]
        "_nvals_c",     # cached host nvals (or None)
        "_host_c",      # cached host (vals, mask) snapshot for bitmap
        "_dev_coo_c",   # cached device COO triples for sparse kernels
        "_coo_t_c",     # cached transposed canonical COO (host)
        "_ell_c",       # cached degree-binned ELL format per orientation
        "_diag_c",      # known-diagonal flag (constructor-set, cleared on write)
        "_format",      # BY_ROW / BY_COL orientation hint
        "_hyper_switch",
        "_sparsity",
        "_iso_v",       # iso format: the single repeated value
    )

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    def __init__(self, typ, nrows, ncols, fmt=None):
        self.type = typ
        self._nrows = int(nrows)
        self._ncols = int(ncols)
        self._pending = []
        self._nvals_c = None
        self._host_c = None
        self._dev_coo_c = None
        self._coo_t_c = None
        self._ell_c = None
        self._diag_c = False
        self._format = config.format
        self._hyper_switch = config.hyper_switch
        self._sparsity = 15  # GxB_AUTO_SPARSITY
        self._iso_v = None
        if fmt is None:
            fmt = "bitmap" if self._fits_bitmap(nrows, ncols, typ) else "coo"
        self._fmt = fmt
        if fmt == "iso":
            self._vals = self._mask = None
            self._rows_h = self._cols_h = self._vals_h = None
        elif fmt == "bitmap":
            dt = typ._jnp_dtype()
            self._vals = jnp.zeros((self._nrows, self._ncols), dt)
            self._mask = jnp.zeros((self._nrows, self._ncols), jnp.bool_)
            self._rows_h = self._cols_h = self._vals_h = None
        else:
            self._vals = self._mask = None
            self._rows_h = np.empty(0, np.int64)
            self._cols_h = np.empty(0, np.int64)
            self._vals_h = np.empty(0, typ._numpy_t)

    @staticmethod
    def _fits_bitmap(nrows, ncols, typ=None):
        if typ is not None and not typ._allows_bitmap:
            return False
        return nrows * ncols <= config.bitmap_max_cells

    @property
    def _is_huge(self):
        """True when this matrix can only live in sparse (COO) form."""
        return not self._fits_bitmap(self._nrows, self._ncols, self.type)

    @classmethod
    def sparse(cls, typ, nrows=None, ncols=None, fill=None, mask=None):
        """Create an empty sparse Matrix.

        Unspecified dimensions default to `GxB_INDEX_MAX` (reference
        matrix.py:119-180); such matrices are hypersparse with O(nnz)
        memory.

        >>> M = Matrix.sparse(types.UINT8)
        >>> M.nrows == GxB_INDEX_MAX and M.ncols == GxB_INDEX_MAX
        True
        >>> M = Matrix.sparse(types.UINT8, 3, 3)
        >>> M.shape
        (3, 3)
        """
        if nrows is None:
            nrows = GxB_INDEX_MAX
        if ncols is None:
            ncols = GxB_INDEX_MAX
        m = cls(typ, nrows, ncols)
        if fill is not None and mask is not None:
            m.assign_scalar(fill, mask=mask)
        return m

    @classmethod
    def dense(cls, typ, nrows=None, ncols=None, fill=None, sparsity=None):
        """Create a dense Matrix: all elements present.

        >>> print(Matrix.dense(types.UINT8, 2, 2, fill=42))
              0  1
          0| 42 42|  0
          1| 42 42|  1
              0  1
        """
        if nrows is None:
            nrows = GxB_INDEX_MAX
        if ncols is None:
            ncols = GxB_INDEX_MAX
        if not cls._fits_bitmap(nrows, ncols, typ):
            if nrows * ncols > cls._SCALAR_FILL_BUDGET:
                raise InsufficientSpace(
                    "dense matrix too large for bitmap format")
            # forced-sparse configuration: materialize as full COO
            m = cls(typ, nrows, ncols, fmt="coo")
            v = typ.default_zero if fill is None else fill
            I = np.repeat(np.arange(nrows, dtype=np.int64), ncols)
            J = np.tile(np.arange(ncols, dtype=np.int64), nrows)
            m._set_coo(I, J, np.full(len(I), typ._coerce(v), typ._numpy_t))
            return m
        m = cls(typ, nrows, ncols, fmt="bitmap")
        v = typ.default_zero if fill is None else fill
        m._vals = jnp.full((m._nrows, m._ncols), typ._coerce(v), typ._jnp_dtype())
        m._mask = jnp.ones((m._nrows, m._ncols), jnp.bool_)
        if sparsity is not None:
            m._sparsity = sparsity
        m._invalidate()
        return m

    @classmethod
    def iso(cls, value, nrows=None, ncols=None):
        """Create a dense Matrix where every element is `value`; the type
        is inferred from the value.

        >>> M = Matrix.iso(3, 2, 2)
        >>> print(M)
              0  1
          0|  3  3|  0
          1|  3  3|  1
              0  1
        >>> M.nvals
        4
        >>> M.type == types.INT64
        True

        Past the dense budget the single value is stored once (O(1),
        like SuiteSparse iso-full, reference matrix.py:233-266), so the
        default `GxB_INDEX_MAX` dims work and any element reads back:

        >>> M = Matrix.iso(3)
        >>> M[42, 42]
        3
        >>> M.nrows == GxB_INDEX_MAX
        True
        """
        if nrows is None:
            nrows = GxB_INDEX_MAX
        if ncols is None:
            ncols = GxB_INDEX_MAX
        typ = _type_from_value(value)
        if not cls._fits_bitmap(nrows, ncols, typ):
            m = cls(typ, nrows, ncols, fmt="iso")
            m._iso_v = typ._coerce(value)
            return m
        return cls.dense(typ, nrows, ncols, fill=value)

    @classmethod
    def from_lists(cls, I, J, V=None, nrows=None, ncols=None, typ=None):
        """Create a new matrix from the given lists of row indices, column
        indices, and values.  If nrows or ncols are not provided, they
        are computed from the max values of the provided row and
        column indices lists.

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [42, 314, 4224])
        >>> print(M)
              0  1  2
          0|    42   |  0
          1|      314|  1
          2|4224      |  2
              0  1  2
        """
        if V is None:
            V = [True] * len(I)
            typ = types.BOOL if typ is None else typ
        if len(I) != len(J) or len(I) != len(V):
            raise InvalidValue("index and value lists must be the same length")
        if nrows is None:
            nrows = max(I) + 1
        if ncols is None:
            ncols = max(J) + 1
        if typ is None:
            typ = _type_from_value(V[0])
        m = cls.sparse(typ, nrows, ncols)
        m._build(np.asarray(I), np.asarray(J), np.asarray(V))
        return m

    @classmethod
    def from_diag(cls, v, k=0, desc=None):
        """Create a Matrix from a Vector's values along diagonal k.

        >>> v = Vector.from_list([1, 2, 3])
        >>> print(Matrix.from_diag(v))
              0  1  2
          0|  1      |  0
          1|     2   |  1
          2|        3|  2
              0  1  2
        """
        n = v.size + abs(k)
        m = cls.sparse(v.type, n, n)
        I, V = v.to_lists()
        if k >= 0:
            m._build(np.asarray(I), np.asarray(I) + k, np.asarray(V))
        else:
            m._build(np.asarray(I) - k, np.asarray(I), np.asarray(V))
        if k == 0:
            m._diag_c = True
        return m

    @classmethod
    def from_mm(cls, mm_file):
        """Create from a MatrixMarket file or file-like object.

        >>> import io
        >>> mm = io.StringIO(
        ...     "%%MatrixMarket matrix coordinate integer general\\n"
        ...     "2 2 2\\n1 2 7\\n2 1 9\\n")
        >>> print(Matrix.from_mm(mm))
              0  1
          0|     7|  0
          1|  9   |  1
              0  1
        """
        from .io.mm import read_mm

        I, J, V, nrows, ncols, typ = read_mm(mm_file)
        m = cls.sparse(typ, nrows, ncols)
        m._build(I, J, V)
        return m

    @classmethod
    def from_tsv(cls, tsv_file, typ, nrows, ncols, **kwargs):
        """Create from a TSV file with a header line.

        >>> import io
        >>> f = io.StringIO("1\\t2\\t7\\n2\\t1\\t9\\n")
        >>> print(Matrix.from_tsv(f, types.INT64, 2, 2))
              0  1
          0|     7|  0
          1|  9   |  1
              0  1
        """
        return cls.from_csv(tsv_file, typ, nrows, ncols, delimiter="\t", **kwargs)

    @classmethod
    def from_csv(cls, csv_file, typ, nrows, ncols, one_based=True,
                 delimiter=",", **reader_args):
        """Create from a CSV file of `row, col, val` lines.

        >>> import io
        >>> f = io.StringIO("1,2,7\\n2,1,9\\n")
        >>> print(Matrix.from_csv(f, types.INT64, 2, 2))
              0  1
          0|     7|  0
          1|  9   |  1
              0  1
        """
        import csv as csv_module

        if isinstance(csv_file, (str, Path)):
            fh = open(csv_file)
        else:
            fh = csv_file
        I, J, V = [], [], []
        kind = np.dtype(typ._numpy_t).kind
        cast = bool if kind == "b" else (float if kind in "fc" else int)
        rd = csv_module.reader(fh, delimiter=delimiter, **reader_args)
        for row in rd:
            if not row or len(row) < 3:
                continue
            try:
                i = int(row[0])
            except ValueError:
                continue  # header
            j = int(row[1])
            if one_based:
                i -= 1
                j -= 1
            I.append(i)
            J.append(j)
            V.append(cast(row[2]))
        m = cls.sparse(typ, nrows, ncols)
        m._build(np.asarray(I, np.int64), np.asarray(J, np.int64),
                 np.asarray(V))
        return m

    @classmethod
    def binread(cls, bin_file, opener=Path.open):
        """Load a Matrix from a binary checkpoint written by `binwrite`.

        >>> import tempfile, os
        >>> M = Matrix.from_lists([0, 1], [1, 0], [7, 9])
        >>> path = os.path.join(tempfile.mkdtemp(), "m.binfile")
        >>> M.binwrite(path)
        >>> Matrix.binread(path).iseq(M)
        True
        """
        from .io.binfile import binread as _binread

        return _binread(cls, bin_file, opener)

    from_binfile = binread

    @classmethod
    def random(cls, typ, nvals, nrows=GxB_INDEX_MAX, ncols=GxB_INDEX_MAX,
               make_pattern=False, make_symmetric=False,
               make_skew_symmetric=False, make_hermitian=True,
               no_diagonal=False, seed=None):
        """Create a random Matrix (same stdlib-random draw order as the
        reference, matrix.py:499-571, so seeded results agree).

        >>> M = Matrix.random(types.UINT8, 10, 10, 10, seed=42)
        >>> M.nvals <= 10
        True
        """
        M = cls.sparse(typ, nrows, ncols)
        if seed is not None:
            _stdlib_random.seed(seed)
        if typ in (types.BOOL, types.UINT8, types.UINT16, types.UINT32,
                   types.UINT64):
            make_skew_symmetric = False
        if M.nrows == 0 or M.ncols == 0:
            nvals = 0
        if M.nrows != M.ncols:
            make_symmetric = False
            make_skew_symmetric = False
            make_hermitian = False
        if make_pattern or make_symmetric:
            make_skew_symmetric = False
            make_hermitian = False
        if make_skew_symmetric:
            make_hermitian = False
            no_diagonal = True
        if typ not in (types.FC32, types.FC64):
            make_hermitian = False
        f = _random_value_fn(typ)
        I, J, V = [], [], []
        for _ in range(nvals):
            i = _stdlib_random.randint(0, M.nrows - 1)
            j = _stdlib_random.randint(0, M.ncols - 1)
            if no_diagonal and i == j:
                continue
            v = typ.default_one if make_pattern else f()
            I.append(i)
            J.append(j)
            V.append(v)
            if make_symmetric and i != j:
                I.append(j)
                J.append(i)
                V.append(v)
        M._build(np.asarray(I, np.int64), np.asarray(J, np.int64),
                 np.asarray(V))
        return M

    @classmethod
    def identity(cls, typ, nrows, value=None):
        """Return a new square identity Matrix of nrows with diagonal set
        to `value` (default: the type's one).

        >>> M = Matrix.identity(types.UINT8, 3, value=42)
        >>> print(M)
              0  1  2
          0| 42      |  0
          1|    42   |  1
          2|       42|  2
              0  1  2
        """
        result = cls.sparse(typ, nrows, nrows)
        if value is None:
            value = typ.default_one
        idx = np.arange(nrows, dtype=np.int64)
        result._build(idx, idx, np.full(nrows, typ._coerce(value)))
        result._diag_c = True
        return result

    @classmethod
    def ssget(cls, name_or_id=None, binary_cache_dir=None):
        """Fetch matrices from the SuiteSparse collection (requires the
        optional ssgetpy package and network access); yields
        ``(filename, Matrix)`` pairs.

        With `binary_cache_dir`, each Matrix-Market file is cached next
        to the download as a `.grb` binfile and later calls skip the MM
        reparse (reference matrix.py:596-624)."""
        import ssgetpy

        result = ssgetpy.search(name_or_id)[0]
        mm_path, _ = result.download(extract=True)
        mm_path = Path(mm_path)
        for m in sorted(mm_path.glob("*.mtx")):
            Mbin = mm_path / (m.name + ".grb")
            if binary_cache_dir and Mbin.exists():
                M = cls.from_binfile(Mbin)
            else:
                M = cls.from_mm(m)
                if binary_cache_dir:
                    M.to_binfile(Mbin)
            M.wait()
            yield m.name, M

    @classmethod
    def from_scipy_sparse(cls, m):
        """Create from a scipy.sparse matrix; type inferred from dtype.

        >>> A = Matrix.from_lists([0, 1, 2], [1, 1, 2], [1, 2, 3])
        >>> B = Matrix.from_scipy_sparse(A.to_scipy_sparse())
        >>> assert A.iseq(B)
        """
        ss = m.tocoo()
        nrows, ncols = ss.shape
        typ = types.MetaType._dtype_type_map[m.dtype.type]
        out = cls.sparse(typ, nrows, ncols)
        out._build(np.asarray(ss.row, np.int64), np.asarray(ss.col, np.int64),
                   np.asarray(ss.data))
        return out

    @classmethod
    def from_numpy(cls, arr):
        """Create a dense-pattern Matrix from a 2-D numpy array.

        >>> import numpy as np
        >>> print(Matrix.from_numpy(np.array([[1, 2], [3, 4]])))
              0  1
          0|  1  2|  0
          1|  3  4|  1
              0  1
        """
        arr = np.asarray(arr)
        typ = types.MetaType._dtype_type_map[arr.dtype.type]
        out = cls.sparse(typ, arr.shape[0], arr.shape[1])
        I, J = np.nonzero(np.ones_like(arr, bool))
        out._build(I.astype(np.int64), J.astype(np.int64), arr[I, J])
        return out

    # ------------------------------------------------------------------
    # internal storage plumbing
    # ------------------------------------------------------------------

    def _invalidate(self):
        self._nvals_c = None
        self._host_c = None
        self._dev_coo_c = None
        self._coo_t_c = None
        self._ell_c = None
        self._diag_c = False

    def _build(self, I, J, V):
        """Bulk-build from COO triples (later duplicates win)."""
        if len(I):
            if I.max() >= self._nrows or J.max() >= self._ncols:
                raise DimensionMismatch("index out of bounds in build")
        r, c, v = ck.build(I, J, V, self.type._numpy_t)
        if self._fmt == "bitmap":
            self._vals = self._vals.at[r, c].set(jnp.asarray(v))
            self._mask = self._mask.at[r, c].set(True)
        else:
            self._rows_h, self._cols_h, self._vals_h = r, c, v
        self._invalidate()

    def _flush(self):
        """Apply pending single-element writes in one vectorized scatter."""
        if not self._pending:
            return
        if self._fmt == "iso":
            # a written iso matrix is no longer iso (reference
            # matrix.py:250-258): decay to COO when enumerable
            if self._nrows * self._ncols > (1 << 27):
                raise InsufficientSpace(
                    "iso matrix too large to modify; copy to a sized "
                    "matrix")
            r = np.repeat(np.arange(self._nrows, dtype=np.int64),
                          self._ncols)
            c = np.tile(np.arange(self._ncols, dtype=np.int64),
                        self._nrows)
            self._fmt = "coo"
            self._rows_h, self._cols_h = r, c
            self._vals_h = np.full(r.size, self._iso_v,
                                   self.type._numpy_t)
            self._iso_v = None
        pend = self._pending
        self._pending = []
        I = np.asarray([p[0] for p in pend], np.int64)
        J = np.asarray([p[1] for p in pend], np.int64)
        V = np.asarray([p[2] for p in pend], self.type._numpy_t)
        I2, J2, V2 = ck.build(I, J, V, self.type._numpy_t)
        if self._fmt == "bitmap":
            self._vals = self._vals.at[I2, J2].set(jnp.asarray(V2))
            self._mask = self._mask.at[I2, J2].set(True)
        else:
            self._rows_h, self._cols_h, self._vals_h = ck.merge_pending(
                self._rows_h, self._cols_h, self._vals_h, I2, J2, V2,
                self.type._numpy_t)
        self._invalidate()

    def _dense_pair(self, transpose=False):
        """Return device (vals, mask), converting COO->bitmap if it fits."""
        self._flush()
        if self._fmt == "iso":
            if not self._fits_bitmap(self._nrows, self._ncols, self.type):
                raise InsufficientSpace(
                    "iso matrix too large to materialize")
            v = jnp.full((self._nrows, self._ncols), self._iso_v,
                         self.type._jnp_dtype())
            m = jnp.ones((self._nrows, self._ncols), jnp.bool_)
            return (v.T, m.T) if transpose else (v, m)
        if self._fmt == "bitmap":
            v, m = self._vals, self._mask
        else:
            if not self._fits_bitmap(self._nrows, self._ncols, self.type):
                raise InsufficientSpace(
                    "matrix too large for the dense execution path")
            v = jnp.zeros((self._nrows, self._ncols), self.type._jnp_dtype())
            m = jnp.zeros((self._nrows, self._ncols), jnp.bool_)
            if self._rows_h.size:
                v = v.at[self._rows_h, self._cols_h].set(
                    jnp.asarray(self._vals_h))
                m = m.at[self._rows_h, self._cols_h].set(True)
        if transpose:
            return v.T, m.T
        return v, m

    def _set_dense(self, vals, mask):
        self._fmt = "bitmap"
        self._rows_h = self._cols_h = self._vals_h = None
        self._vals = vals
        self._mask = mask
        self._invalidate()

    def _host_pair(self):
        """Host numpy snapshot of (vals, mask) for bitmap matrices."""
        self._flush()
        if self._host_c is None:
            v, m = self._dense_pair()
            self._host_c = (np.asarray(v), np.asarray(m))
        return self._host_c

    def _coo(self):
        """Host canonical COO triples (rows, cols, vals)."""
        self._flush()
        if self._fmt == "iso":
            if self._nrows * self._ncols > (1 << 27):
                raise InsufficientSpace(
                    "iso matrix too large to enumerate")
            r = np.repeat(np.arange(self._nrows, dtype=np.int64),
                          self._ncols)
            c = np.tile(np.arange(self._ncols, dtype=np.int64),
                        self._nrows)
            return r, c, np.full(r.size, self._iso_v, self.type._numpy_t)
        if self._fmt == "coo":
            return self._rows_h, self._cols_h, self._vals_h
        v, m = self._host_pair()
        r, c = np.nonzero(m)
        return r.astype(np.int64), c.astype(np.int64), v[r, c]

    def _coo_T(self):
        """Transposed canonical COO (col-major re-sort), cached: mxm
        needs B^T rows, and iterative algorithms (k-truss) re-multiply
        the same matrix every round — the re-sort is the single largest
        host cost of a warm masked SpGEMM."""
        if self._coo_t_c is None:
            r, c, v = self._coo()
            self._coo_t_c = ck.build(c, r, v, v.dtype)
        return self._coo_t_c

    @classmethod
    def _from_parts(cls, typ, nrows, ncols, vals, mask):
        out = cls.sparse(typ, nrows, ncols)
        out._set_dense(vals, mask)
        return out

    def _out_like(self, typ=None, nrows=None, ncols=None):
        return Matrix.sparse(typ or self.type, nrows or self._nrows,
                             ncols or self._ncols)

    # ------------------------------------------------------------------
    # writeback: C<M> (accum)= T  -- shared by every operation
    # ------------------------------------------------------------------

    def _writeback(self, out, t_vals, t_mask, mask, accum, desc):
        if mask is not None:
            if isinstance(mask, Matrix):
                mv, mm = mask._dense_pair()
            else:
                raise TypeError("matrix operations take Matrix masks")
            if mv.shape != t_vals.shape:
                raise DimensionMismatch("mask shape does not match output")
        else:
            mv = mm = None
        c_vals, c_mask = out._dense_pair()
        if c_vals.shape != t_vals.shape:
            raise DimensionMismatch(
                f"output shape {c_vals.shape} != result shape {t_vals.shape}")
        nv, nm = dk.writeback(
            c_vals, c_mask, t_vals, t_mask, mv, mm,
            accum=accum,
            complement=desc.complement,
            structural=desc.structural,
            replace=desc.replace,
        )
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
    # sparse (COO) writeback: the huge-matrix twin of _writeback, full
    # mask/accum/replace semantics at any logical dimension
    # ------------------------------------------------------------------

    def _set_coo(self, r, c, v):
        """Install canonical COO triples as this matrix's contents."""
        self._fmt = "coo"
        self._vals = self._mask = None
        self._pending = []
        self._rows_h = np.asarray(r, np.int64)
        self._cols_h = np.asarray(c, np.int64)
        self._vals_h = np.asarray(v).astype(self.type._numpy_t)
        self._invalidate()

    @staticmethod
    def _np_binop(op):
        """numpy-vectorized closure of a BinaryOp (through its traced
        jax apply; struct UDT ops convert at the op boundary)."""
        def fn(x, y):
            if getattr(op, "udt", None) is not None:
                return np.asarray(op.apply(x, y))
            return np.asarray(op.apply(jnp.asarray(x), jnp.asarray(y)))
        return fn

    def _mask_pair_set(self, mask, desc):
        """The mask's TRUE (row, col) pair set for sparse writeback."""
        if mask is None:
            return None, None
        if not isinstance(mask, Matrix):
            raise TypeError("matrix operations take Matrix masks")
        mr, mc, mv = mask._coo()
        return cs.mask_pairs(mr, mc, mv, desc.structural)

    def _coo_writeback(self, out, tr, tc, tv, mask, accum, desc):
        """C<M> (accum)= T with T given as canonical COO triples."""
        if mask is not None and mask.shape != out.shape:
            raise DimensionMismatch("mask shape does not match output")
        mpr, mpc = self._mask_pair_set(mask, desc)
        cr, cc, cv = out._coo()
        accum_fn = self._np_binop(accum) if accum is not None else None
        nr, nc, nv = cs.writeback(cr, cc, cv, tr, tc,
                                  np.asarray(tv), mpr, mpc, accum_fn,
                                  desc.complement, desc.replace,
                                  out.type._numpy_t)
        out._set_coo(nr, nc, nv)
        return out

    # ------------------------------------------------------------------
    # properties
    # ------------------------------------------------------------------

    @property
    def gb_type(self):
        """Return the GraphBLAS type object of the Matrix.

        >>> M = Matrix.sparse(types.FP32, 2, 2)
        >>> M.gb_type == types.FP32
        True
        """
        return self.type

    @property
    def nrows(self):
        """Number of rows.

        >>> M = Matrix.sparse(types.UINT8, 3, 3)
        >>> M.nrows
        3
        """
        return self._nrows

    @property
    def ncols(self):
        """Number of columns.

        >>> Matrix.sparse(types.INT8, 3, 5).ncols
        5
        """
        return self._ncols

    @property
    def shape(self):
        """Tuple of (nrows, ncols).

        >>> M = Matrix.sparse(types.UINT8, 3, 4)
        >>> M.shape
        (3, 4)
        """
        return (self._nrows, self._ncols)

    @property
    def square(self):
        """True if the Matrix is square.

        >>> Matrix.sparse(types.INT8, 3, 3).square
        True
        >>> Matrix.sparse(types.INT8, 3, 5).square
        False
        """
        return self._nrows == self._ncols

    @property
    def nvals(self):
        """Number of stored elements.

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [42, 314, 4224])
        >>> M.nvals
        3
        """
        self._flush()
        if self._nvals_c is None:
            if self._fmt == "iso":
                self._nvals_c = self._nrows * self._ncols
            elif self._fmt == "coo":
                self._nvals_c = int(self._rows_h.size)
            else:
                self._nvals_c = int(jnp.sum(self._mask))
        return self._nvals_c

    @property
    def memory_usage(self):
        """Bytes used by this matrix's storage.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [7, 9])
        >>> M.memory_usage > 0
        True
        """
        self._flush()
        if self._fmt == "iso":
            return np.dtype(self.type._numpy_t).itemsize
        if self._fmt == "coo":
            return (self._rows_h.nbytes + self._cols_h.nbytes
                    + self._vals_h.nbytes)
        return self._vals.nbytes + self._mask.nbytes

    @property
    def T(self):
        """Transposed copy (see `Matrix.transpose`).

        >>> M = Matrix.from_lists([0, 0], [0, 1], [1, 2])
        >>> print(M.T)
              0
          0|  1|  0
          1|  2|  1
              0
        """
        return self.transpose()

    @property
    def M(self):
        """The pattern mask of this matrix; see `Matrix.pattern`.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [7, 9])
        >>> print(M.M)
              0  1
          0|     t|  0
          1|  t   |  1
              0  1
        """
        return self.pattern()

    @property
    def S(self):
        """The structure of this matrix; same as `Matrix.pattern()`.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [7, 9])
        >>> print(M.S)
              0  1
          0|     t|  0
          1|  t   |  1
              0  1
        """
        return self.pattern()

    @property
    def hyper_switch(self):
        """Hypersparsity switching threshold (parity knob).

        >>> M = Matrix.sparse(types.INT8, 2, 2)
        >>> M.hyper_switch = 0.5
        >>> M.hyper_switch
        0.5
        """
        return self._hyper_switch

    @hyper_switch.setter
    def hyper_switch(self, switch):
        self._hyper_switch = float(switch)

    @property
    def format(self):
        """Storage orientation: BY_ROW (0) or BY_COL (1).

        >>> Matrix.sparse(types.INT8, 2, 2).format
        0
        """
        return self._format

    @format.setter
    def format(self, fmt):
        self._format = int(fmt)

    @property
    def sparsity(self):
        """Sparsity control (GxB parity: 1=hyper 2=sparse 4=bitmap 8=full,
        15=auto).

        >>> M = Matrix.sparse(types.INT8, 2, 2)
        >>> M.sparsity
        15
        >>> M.sparsity = 4
        >>> M.sparsity
        4
        """
        return self._sparsity

    @sparsity.setter
    def sparsity(self, sparsity):
        """Setting the control CONVERTS storage (SuiteSparse semantics:
        the knob constrains the physical format, it is not advisory):
        1|2 moves a bitmap matrix to sorted-COO; 4|8 moves COO to
        bitmap when the dense budget allows."""
        self._sparsity = int(sparsity)
        self._flush()
        wants_sparse = not (self._sparsity & 12)  # no bitmap/full bits
        wants_dense = not (self._sparsity & 3)    # no hyper/sparse bits
        if wants_sparse and self._fmt == "bitmap":
            r, c, v = self._coo()
            self._fmt = "coo"
            self._vals = self._mask = None
            self._rows_h, self._cols_h = r, c
            self._vals_h = v
            self._invalidate()
        elif wants_dense and self._fmt == "coo" \
                and self._fits_bitmap(self._nrows, self._ncols,
                                      self.type):
            v, m = self._dense_pair()
            self._set_dense(v, m)

    @property
    def sparsity_status(self):
        """Current physical format: 1=hypersparse, 2=sparse, 4=bitmap,
        8=full.

        >>> Matrix.from_lists([0, 1], [1, 0], [7, 9]).sparsity_status
        4
        """
        self._flush()
        if self._fmt == "iso":
            return 8
        if self._fmt == "coo":
            return 1
        if self.nvals == self._nrows * self._ncols:
            return 8
        return 4

    def pattern(self, typ=types.BOOL, out=None):
        """Return the pattern of the matrix: every present value set to
        the identity value of the given type (default BOOL).

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [42, 314, 142])
        >>> print(M.pattern())
              0  1  2
          0|     t   |  0
          1|        t|  1
          2|  t      |  2
              0  1  2
        >>> print(Matrix.from_lists([0, 1], [1, 0], [7, 9]).pattern(
        ...     types.INT8))
              0  1
          0|     1|  0
          1|  1   |  1
              0  1
        """
        if out is None:
            out = Matrix.sparse(typ, self.nrows, self.ncols)
        return self.apply(typ.ONE, out=out)

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    def dup(self, clear=False):
        """Create a duplicate Matrix (or an empty same-shape one).

        >>> A = Matrix.from_lists([0], [0], [42], 1, 1)
        >>> B = A.dup()
        >>> B.iseq(A)
        True
        """
        out = Matrix.sparse(self.type, self._nrows, self._ncols)
        if clear:
            return out
        self._flush()
        if self._fmt == "bitmap":
            out._set_dense(self._vals, self._mask)
        else:
            out._rows_h = self._rows_h.copy()
            out._cols_h = self._cols_h.copy()
            out._vals_h = self._vals_h.copy()
            out._invalidate()
        return out

    def clear(self):
        """Remove all elements (dimensions unchanged).

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [42, 314, 4224])
        >>> M.clear()
        >>> M.nvals
        0
        """
        self._pending = []
        if self._fmt == "bitmap":
            self._vals = jnp.zeros_like(self._vals)
            self._mask = jnp.zeros_like(self._mask)
        else:
            self._rows_h = np.empty(0, np.int64)
            self._cols_h = np.empty(0, np.int64)
            self._vals_h = np.empty(0, self.type._numpy_t)
        self._invalidate()

    def resize(self, nrows=GxB_INDEX_MAX, ncols=GxB_INDEX_MAX):
        """Resize the matrix; values outside the new bounds are dropped.

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [42, 314, 4224])
        >>> M.resize(10, 10)
        >>> M.shape
        (10, 10)
        """
        r, c, v = self._coo()
        keep = (r < nrows) & (c < ncols)
        self._nrows = int(nrows)
        self._ncols = int(ncols)
        self._fmt = "bitmap" if self._fits_bitmap(nrows, ncols, self.type) else "coo"
        dt = self.type._jnp_dtype()
        if self._fmt == "bitmap":
            self._vals = jnp.zeros((self._nrows, self._ncols), dt)
            self._mask = jnp.zeros((self._nrows, self._ncols), jnp.bool_)
            self._rows_h = self._cols_h = self._vals_h = None
        else:
            self._vals = self._mask = None
        self._invalidate()
        self._build(r[keep], c[keep], v[keep])

    def wait(self):
        """Barrier: complete all pending work on this Matrix.

        >>> M = Matrix.sparse(types.INT64, 2, 2)
        >>> M[0, 1] = 7
        >>> M.wait()
        >>> M.nvals
        1
        """
        self._flush()
        if self._fmt == "bitmap":
            self._vals.block_until_ready()

    # ------------------------------------------------------------------
    # element access / iteration / export
    # ------------------------------------------------------------------

    def __setitem__(self, index, value):
        """Write an element, row, column, or region.

        >>> A = Matrix.sparse(types.INT64, 3, 3)
        >>> A[0, 1] = 7
        >>> A[2] = Vector.from_list([1, 2, 3])
        >>> print(A)
              0  1  2
          0|     7   |  0
          1|         |  1
          2|  1  2  3|  2
              0  1  2
        >>> A[:, 0] = Vector.from_list([9, 9, 9])
        >>> print(A)
              0  1  2
          0|  9  7   |  0
          1|  9      |  1
          2|  9  2  3|  2
              0  1  2
        """
        if _is_int(index):
            if _is_scalar(value):
                return self.assign_scalar(value, index)
            from .vector import Vector

            if isinstance(value, Vector):
                return self.assign_row(index, value)
            raise TypeError
        if isinstance(index, slice):
            if isinstance(value, Matrix):
                return self.assign_matrix(value, index, None)
            if _is_scalar(value):
                return self.assign_scalar(value, index, None)
            raise TypeError
        if isinstance(index, Matrix):
            if isinstance(value, Matrix):
                return self.assign_matrix(value, mask=index)
            if _is_scalar(value):
                return self.assign_scalar(value, mask=index)
            raise TypeError
        if not isinstance(index, (tuple, list)):
            raise TypeError
        i0, i1 = index[0], index[1]
        from .vector import Vector

        if _is_int(i0) and _is_int(i1):
            if not (0 <= i0 < self._nrows and 0 <= i1 < self._ncols):
                raise InvalidIndex("index out of bounds")
            self._pending.append(
                (i0, i1, self.type._coerce(self.type._from_value(value))))
            self._invalidate()
            return
        if _is_int(i0) and isinstance(i1, slice):
            if isinstance(value, Vector):
                return self.assign_row(i0, value, i1)
            return self.assign_scalar(value, i0, i1)
        if isinstance(i0, slice) and _is_int(i1):
            if isinstance(value, Vector):
                return self.assign_col(i1, value, i0)
            return self.assign_scalar(value, i0, i1)
        if isinstance(i0, slice) and isinstance(i1, slice):
            if _is_scalar(value):
                return self.assign_scalar(value, i0, i1)
            return self.assign_matrix(value, i0, i1)
        raise TypeError

    def __getitem__(self, index):
        """Read an element, row, column, or submatrix.

        >>> A = Matrix.from_lists([0, 1, 2], [1, 2, 0], [1, 2, 3])
        >>> A[0, 1]
        1
        >>> print(A[:, 2])
        0|
        1| 2
        2|
        >>> print(A[0:1, :])
              0  1  2
          0|     1   |  0
          1|        2|  1
              0  1  2
        """
        if _is_int(index):
            return self.extract_row(index, None)
        if isinstance(index, slice):
            return self.extract_matrix(index, None)
        if isinstance(index, Matrix):
            return self.extract_matrix(mask=index)
        if not isinstance(index, (tuple, list)):
            raise TypeError
        i0, i1 = index[0], index[1]
        if _is_int(i0) and _is_int(i1):
            return self._extract_element(i0, i1)
        if _is_int(i0) and isinstance(i1, slice):
            return self.extract_row(i0, i1)
        if isinstance(i0, slice) and _is_int(i1):
            return self.extract_col(i1, i0)
        return self.extract_matrix(i0, i1)

    def _extract_element(self, i, j):
        if not (0 <= i < self._nrows and 0 <= j < self._ncols):
            raise InvalidIndex("index out of bounds")
        self._flush()
        if self._fmt == "iso":
            return self.type._to_value(self._iso_v)
        if self._fmt == "coo":
            pos = ck.find(self._rows_h, self._cols_h, i, j)
            if pos < 0:
                raise NoValue
            return self.type._to_value(self._vals_h[pos])
        v, m = self._host_pair()
        if not m[i, j]:
            raise NoValue
        return self.type._to_value(v[i, j])

    def __delitem__(self, index):
        """Remove a single stored element.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [7, 9])
        >>> del M[0, 1]
        >>> M.to_lists()
        [[1], [0], [9]]
        """
        if (not isinstance(index, tuple) or not _is_int(index[0])
                or not _is_int(index[1])):
            raise TypeError("__delitem__ only supports single element removal")
        i, j = index
        self._flush()
        if self._fmt == "coo":
            self._rows_h, self._cols_h, self._vals_h, _ = ck.remove(
                self._rows_h, self._cols_h, self._vals_h, i, j)
        else:
            self._mask = self._mask.at[i, j].set(False)
            self._vals = self._vals.at[i, j].set(0)
        self._invalidate()

    def __contains__(self, index):
        """True iff an element is stored at (i, j).

        >>> M = Matrix.from_lists([0, 1], [1, 0], [7, 9])
        >>> (0, 1) in M
        True
        >>> (0, 0) in M
        False
        """
        try:
            self[index]
            return True
        except NoValue:
            return False

    def get(self, i, j, default=None):
        """Element at (i, j), or `default` if not present.

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [42, 0, 149])
        >>> M.get(1, 2)
        0
        >>> M.get(0, 0) is None
        True
        >>> M.get(0, 0, 'foo')
        'foo'
        """
        try:
            return self[i, j]
        except NoValue:
            return default

    def __iter__(self):
        """Iterate (row, col, value) triples.

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [42, 314, 4224])
        >>> sorted(list(iter(M)))
        [(0, 1, 42), (1, 2, 314), (2, 0, 4224)]
        """
        r, c, v = self._coo()
        return zip(map(int, r), map(int, c), map(self.type._to_value, v))

    def to_lists(self):
        """Return (row indices, col indices, values) as Python lists.

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [42, 314, 4224])
        >>> M.to_lists()
        [[0, 1, 2], [1, 2, 0], [42, 314, 4224]]
        """
        r, c, v = self._coo()
        return [list(map(int, r)), list(map(int, c)),
                list(map(self.type._to_value, v))]

    def to_arrays(self):
        """Return (rows, cols, vals) as stdlib array objects.

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [42, 314, 4224])
        >>> M.to_arrays()
        (array('L', [0, 1, 2]), array('L', [1, 2, 0]), array('q', [42, 314, 4224]))
        """
        if self.type._typecode is None:
            raise TypeError("This matrix has no array typecode.")
        r, c, v = self._coo()
        return (array("L", map(int, r)), array("L", map(int, c)),
                array(self.type._typecode, map(self.type._to_value, v)))

    @property
    def rows(self):
        """Array of row indices of stored elements (row-major order).

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [42, 314, 4224])
        >>> list(M.rows)
        [0, 1, 2]
        """
        return array("L", map(int, self._coo()[0]))

    @property
    def I(self):
        """Iterator over `Matrix.rows`.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [7, 9])
        >>> list(M.I)
        [0, 1]
        """
        return iter(self.rows)

    @property
    def npI(self):
        """numpy array of row indices.

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [42, 314, 4224])
        >>> M.npI
        array([0, 1, 2], dtype=uint64)
        """
        return self._coo()[0].astype(np.uint64)

    @property
    def cols(self):
        """Array of column indices of stored elements.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [7, 9])
        >>> list(M.cols)
        [1, 0]
        """
        return array("L", map(int, self._coo()[1]))

    @property
    def J(self):
        """Iterator over `Matrix.cols`.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [7, 9])
        >>> list(M.J)
        [1, 0]
        """
        return iter(self.cols)

    @property
    def npJ(self):
        """numpy array of column indices.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [7, 9])
        >>> M.npJ
        array([1, 0], dtype=uint64)
        """
        return self._coo()[1].astype(np.uint64)

    @property
    def vals(self):
        """Array of stored values.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [7, 9])
        >>> list(M.vals)
        [7, 9]
        """
        v = self._coo()[2]
        if self.type._typecode is None:
            return list(map(self.type._to_value, v))
        return array(self.type._typecode, map(self.type._to_value, v))

    @property
    def V(self):
        """Iterator over `Matrix.vals`.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [7, 9])
        >>> list(M.V)
        [7, 9]
        """
        return iter(self.vals)

    @property
    def npV(self):
        """numpy array of stored values.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [7, 9])
        >>> M.npV
        array([7, 9])
        """
        return np.asarray(self._coo()[2])

    def to_scipy_sparse(self, format="csr"):
        """Return a scipy sparse matrix copy of this Matrix.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [7, 9])
        >>> M.to_scipy_sparse().toarray()
        array([[0, 7],
               [9, 0]])
        """
        from scipy import sparse

        r, c, v = self._coo()
        s = sparse.coo_matrix((v, (r, c)), shape=self.shape,
                              dtype=self.type._numpy_t)
        if format == "coo":
            return s
        if format not in {"bsr", "csr", "csc", "coo", "lil", "dia", "dok"}:
            raise TypeError(f"Invalid format: {format}")
        return s.asformat(format)

    def to_numpy(self):
        """Return a dense numpy array copy of this Matrix.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [42, 149])
        >>> M.to_numpy()
        array([[  0,  42],
               [149,   0]])
        """
        self._flush()
        if self._fmt == "bitmap":
            v, m = self._host_pair()
            return np.where(m, v, np.zeros((), v.dtype))
        if self._nrows * self._ncols > self._SCALAR_FILL_BUDGET:
            raise InsufficientSpace("matrix too large to densify")
        r, c, v = self._coo()
        arr = np.zeros(self.shape, self.type._numpy_t)
        arr[r, c] = v
        return arr

    def binwrite(self, filename, comments="", opener=Path.open):
        """Write this Matrix to a binary checkpoint file.

        >>> import tempfile, os
        >>> M = Matrix.from_lists([0, 1], [1, 0], [7, 9])
        >>> path = os.path.join(tempfile.mkdtemp(), "m.binfile")
        >>> M.binwrite(path)
        >>> Matrix.binread(path).iseq(M)
        True
        """
        from .io.binfile import binwrite as _binwrite

        return _binwrite(self, filename, comments, opener)

    to_binfile = binwrite

    def to_mm(self, fileobj):
        """Write this Matrix to a MatrixMarket file-like object.

        >>> import io
        >>> M = Matrix.from_lists([0, 1], [1, 0], [7, 9])
        >>> f = io.StringIO()
        >>> M.to_mm(f)
        >>> print(f.getvalue(), end="")
        %%MatrixMarket matrix coordinate integer general
        2 2 2
        1 2 7
        2 1 9
        """
        from .io.mm import write_mm

        write_mm(self, fileobj)

    # ------------------------------------------------------------------
    # rendering
    # ------------------------------------------------------------------

    def to_string(self, format_string="{:>%s}", width=3, prec=5,
                  empty_char="", cell_sep=""):
        """ASCII grid rendering (same layout as the reference,
        matrix.py:3458-3481).

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [42, 0, 149])
        >>> M.to_string()
        '      0  1  2\\n  0|    42   |  0\\n  1|        0|  1\\n  2|149      |  2\\n      0  1  2'
        """
        format_string = format_string % width
        header = (format_string.format("") + " "
                  + "".join(format_string.format(i) for i in range(self.ncols)))
        result = header + "\n"
        for row in range(self.nrows):
            result += format_string.format(row) + "|"
            for col in range(self.ncols):
                value = self.get(row, col, empty_char)
                result += cell_sep + self.type.format_value(value, width, prec)
            result += "|  " + str(row) + "\n"
        result += header
        return result

    def __str__(self):
        return self.to_string()

    def __repr__(self):
        tname = self.type.__name__
        if self._nrows == GxB_INDEX_MAX and self._ncols == GxB_INDEX_MAX:
            return f"<Matrix({tname}, nvals: {self.nvals})>"
        return f"<Matrix({tname}, shape: {self.shape}, nvals: {self.nvals})>"

    def to_markdown_table(self, title="A", width=2):
        """Markdown-table rendering.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [7, 9])
        >>> print(M.to_markdown_table())
        A|0|1
        ---|---|---
        0||7
        1|9|
        """
        rows = []
        header = [title] + [str(j) for j in range(self.ncols)]
        rows.append("|".join(header))
        rows.append("|".join(["---"] * len(header)))
        for i in range(self.nrows):
            cells = [str(i)]
            for j in range(self.ncols):
                v = self.get(i, j)
                cells.append("" if v is None else str(v))
            rows.append("|".join(cells))
        return "\n".join(rows)

    def to_html_table(self, title="A", width=2):
        """HTML-table rendering for notebooks.

        >>> M = Matrix.from_lists([0], [0], [7])
        >>> print(M.to_html_table())
        <table><tr><th>A</th><th>0</th></tr><tr><th>0</th><td>7</td></tr></table>
        """
        out = [f"<table><tr><th>{title}</th>"]
        for j in range(self.ncols):
            out.append(f"<th>{j}</th>")
        out.append("</tr>")
        for i in range(self.nrows):
            out.append(f"<tr><th>{i}</th>")
            for j in range(self.ncols):
                v = self.get(i, j)
                out.append("<td>%s</td>" % ("" if v is None else v))
            out.append("</tr>")
        out.append("</table>")
        return "".join(out)

    def _repr_html_(self):  # pragma: no cover
        return self.to_html_table()

    def print(self, level=2, name="A", f=None):  # pragma: no cover
        """Print a diagnostic dump of the matrix (burble-style levels)."""
        import sys

        f = f or sys.stdout
        print(f"GraphBLAS Matrix {name}: {self.type.__name__} "
              f"{self.shape} nvals={self.nvals} fmt={self._fmt}", file=f)
        if level >= 3:
            print(self.to_string(), file=f)

    # ------------------------------------------------------------------
    # transpose / cast
    # ------------------------------------------------------------------

    @_timed("Matrix.transpose")
    def transpose(self, cast=None, out=None, mask=None, accum=None, desc=None):
        """Transpose (and optionally cast) the Matrix.

        With desc=T0 this is the fast way to cast or copy without
        transposing (reference matrix.py:1003-1061).

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [42, 0, 149])
        >>> print(M.transpose())
              0  1  2
          0|      149|  0
          1| 42      |  1
          2|     0   |  2
              0  1  2
        >>> M.transpose(desc=descriptor.T0).iseq(M)
        True
        >>> A = Matrix.from_lists([0], [0], [3])
        >>> A.transpose(cast=types.FP32).type is types.FP32
        True
        """
        mask, accum, desc = self._get_args(mask, accum, desc)
        really_transpose = not desc.inp0
        if out is None:
            nr, nc = ((self._nrows, self._ncols) if not really_transpose
                      else (self._ncols, self._nrows))
            typ = cast if cast is not None else self.type
            out = Matrix.sparse(typ, nr, nc)
        if self._is_huge or out._is_huge:
            # sparse path: host index swap + re-sort (O(nnz log nnz))
            r, c, v = self._coo()
            if really_transpose:
                r, c, v = ck.build(c, r, v, v.dtype)
            return self._coo_writeback(out, r, c,
                                       v.astype(out.type._numpy_t),
                                       mask, accum, desc)
        v, m = self._dense_pair()
        if really_transpose:
            v, m = v.T, m.T
        v = v.astype(out.type._jnp_dtype())
        return self._writeback(out, v, m, mask, accum, desc)

    def cast(self, cast, out=None):
        """Cast this matrix to another type.

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [42, 0, 149])
        >>> M.cast(types.FP32).type is types.FP32
        True
        >>> print(Matrix.from_lists([0], [0], [3]).cast(types.FP64))
              0
          0|3.0|  0
              0
        """
        return self.transpose(cast, out, desc=T0)

    # ------------------------------------------------------------------
    # element-wise ops
    # ------------------------------------------------------------------

    def _resolve_eop(self, op, default, for_eadd):
        """Resolve an eadd/emult operator argument: BinaryOp, Monoid,
        Semiring, or string."""
        if op is None:
            op = current_binop.get(None)
            if op is None:
                op = current_monoid.get(None)
            if op is None:
                op = default()
        if isinstance(op, str):
            op = _get_bin_op(op, self.type)
        if isinstance(op, Semiring):
            op = op.add_monoid.binaryop if for_eadd else op.mul_op
        if isinstance(op, Monoid):
            op = op.binaryop
        return op

    @_timed("Matrix.eadd")
    def eadd(self, other, add_op=None, cast=None, out=None, mask=None,
             accum=None, desc=None):
        """Element-wise union with `other`: the result pattern is the set
        union; the operator applies where both are present.

        >>> A = Matrix.from_lists([0, 1], [1, 0], [1, 2])
        >>> B = Matrix.from_lists([0, 1], [1, 1], [10, 20])
        >>> print(A.eadd(B))
              0  1
          0|    11|  0
          1|  2 20|  1
              0  1

        The operator may be a BinaryOp, a Monoid, a Semiring (its add
        monoid is taken), or an operator string:

        >>> print(A.eadd(B, '+'))
              0  1
          0|    11|  0
          1|  2 20|  1
              0  1
        >>> print(A.eadd(B, types.INT64.MIN))
              0  1
          0|     1|  0
          1|  2 20|  1
              0  1
        """
        add_op = self._resolve_eop(add_op, lambda: None, True)
        mask, accum, desc = self._get_args(mask, accum, desc)
        if out is None:
            typ = cast or promote(self.type, other.type)
            out = Matrix.sparse(typ, self._nrows, self._ncols)
        if add_op is None:
            add_op = out.type._default_addop()
        if self._is_huge or other._is_huge:
            return self._ewise_huge(other, add_op, out, mask, accum, desc,
                                    union=True)
        av, am = self._dense_pair(desc.inp0)
        bv, bm = other._dense_pair(desc.inp1)
        if av.shape != bv.shape:
            raise DimensionMismatch("eadd shape mismatch")
        tv, tm = dk.eadd(av, am, bv, bm, add_op, out.type._jnp_dtype())
        return self._writeback(out, tv, tm, mask, accum, desc)

    def _ewise_huge(self, other, op, out, mask, accum, desc, union):
        """Element-wise union/intersection on huge COO matrices, full
        mask/accum semantics.  Large numeric inputs run the sort-based
        device engine (core/dewise.py); the rest take the host native
        single-pass merges (core/coosparse.py)."""
        ra, ca, va = self._coo()
        if desc.inp0:
            ra, ca, va = ck.build(ca, ra, va, va.dtype)
        rb, cb, vb = other._coo()
        if desc.inp1:
            rb, cb, vb = ck.build(cb, rb, vb, vb.dtype)
        dt = out.type._numpy_t

        dtk = np.dtype(dt)
        if (getattr(op, "udt", None) is None
                and getattr(op, "positional", None) is None
                and op.ztype_rule not in ("CMPLX",)
                and dtk.kind in "biuf"):
            max_r = int(max(ra[-1] if len(ra) else 0,
                            rb[-1] if len(rb) else 0))
            max_c = int(max(ca.max() if len(ca) else 0,
                            cb.max() if len(cb) else 0))
            if op.ztype_rule == "BOOL":
                cdt = np.promote_types(va.dtype, vb.dtype)
            else:
                cdt = dtk
            if cdt.kind in "biuf" and dw.eligible(
                    len(ra), len(rb), max_r, max_c, cdt, dt):
                from .base import burble

                burble("ewise: device sort engine (%d + %d nnz)",
                       len(ra), len(rb))
                r, c, v = dw.ewise(
                    ra, ca, va, rb, cb, vb, op.apply,
                    (op, cdt.str, dtk.str), cdt, dtk, union=union)
                return self._coo_writeback(out, r, c, v, mask, accum,
                                           desc)

        def fn(x, y):
            if getattr(op, "udt", None) is not None:
                return np.asarray(op.apply(x, y))  # struct-aware
            if op.ztype_rule != "BOOL":
                x = x.astype(dt)
                y = y.astype(dt)
            return np.asarray(op.apply(jnp.asarray(x), jnp.asarray(y)))

        r, c, v = ck.ewise(ra, ca, va, rb, cb, vb, fn, dt, union=union)
        return self._coo_writeback(out, r, c, v, mask, accum, desc)

    union = eadd

    @_timed("Matrix.emult")
    def emult(self, other, mult_op=None, cast=None, out=None, mask=None,
              accum=None, desc=None):
        """Element-wise intersection with `other`: the result pattern is
        the set intersection.

        >>> A = Matrix.from_lists([0, 1], [1, 0], [1, 2])
        >>> B = Matrix.from_lists([0, 1], [1, 1], [10, 20])
        >>> print(A.emult(B))
              0  1
          0|    10|  0
          1|      |  1
              0  1
        >>> print(A.emult(B, '+'))
              0  1
          0|    11|  0
          1|      |  1
              0  1
        """
        mult_op = self._resolve_eop(mult_op, lambda: None, False)
        mask, accum, desc = self._get_args(mask, accum, desc)
        if out is None:
            typ = cast or promote(self.type, other.type)
            out = Matrix.sparse(typ, self._nrows, self._ncols)
        if mult_op is None:
            mult_op = out.type._default_multop()
        if self._is_huge or other._is_huge:
            return self._ewise_huge(other, mult_op, out, mask, accum, desc,
                                    union=False)
        av, am = self._dense_pair(desc.inp0)
        bv, bm = other._dense_pair(desc.inp1)
        if av.shape != bv.shape:
            raise DimensionMismatch("emult shape mismatch")
        ztype = mult_op.ztype(self.type)
        tv, tm = dk.emult(av, am, bv, bm, mult_op, ztype._jnp_dtype())
        return self._writeback(out, tv, tm, mask, accum, desc)

    intersection = emult

    def all(self, other, op):
        """True iff matrices have the same shape and pattern and `op`
        holds for every matched pair of values.

        >>> A = Matrix.from_lists([0, 1], [1, 0], [1, 2])
        >>> A.all(A, types.INT64.EQ)
        True
        """
        if self.shape != other.shape:
            return False
        if self.nvals != other.nvals:
            return False
        C = self.emult(other, op, cast=types.BOOL)
        if C.nvals != self.nvals:
            return False
        return C.reduce_bool(types.BOOL.LAND_MONOID)

    def iseq(self, other):
        """True iff structurally and numerically equal.

        >>> A = Matrix.from_lists([0, 1], [1, 0], [1, 2])
        >>> A.iseq(A.dup())
        True
        """
        if self.type != other.type:
            return False
        return self.all(other, self.type.EQ)

    def isne(self, other):
        """True iff not equal; see `Matrix.iseq`.

        >>> A = Matrix.from_lists([0], [0], [1])
        >>> B = Matrix.from_lists([0], [0], [2])
        >>> A.isne(B)
        True
        >>> A.isne(A)
        False
        """
        return not self.iseq(other)

    # ------------------------------------------------------------------
    # apply / select
    # ------------------------------------------------------------------

    @_timed("Matrix.apply")
    def apply(self, op, out=None, mask=None, accum=None, desc=None):
        """Apply a unary operator to every element.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [-1, -2])
        >>> print(M.apply(types.INT64.AINV))
              0  1
          0|     1|  0
          1|  2   |  1
              0  1
        """
        if isinstance(op, _pytypes.FunctionType):
            from .unaryop import UnaryOp

            op = UnaryOp(op.__name__, self.type.__name__, fn=op, attach=False)
        mask, accum, desc = self._get_args(mask, accum, desc)
        ztype = op.ztype(self.type)
        if out is None:
            out = Matrix.sparse(ztype, self._nrows, self._ncols)
        if self._is_huge:
            r, c, v = self._coo()
            if desc.inp0:
                r, c, v = ck.build(c, r, v, v.dtype)
            if op.positional:
                pos = dict(i=jnp.asarray(r), j=jnp.asarray(c))
                nv = op.apply(None, pos)
            else:
                nv = op.apply(jnp.asarray(v))
            return self._coo_writeback(
                out, r, c, np.asarray(nv).astype(out.type._numpy_t),
                mask, accum, desc)
        v, m = self._dense_pair(desc.inp0)
        tv, tm = dk.apply_unary(v, m, op, ztype._jnp_dtype())
        return self._writeback(out, tv, tm, mask, accum, desc)

    def apply_first(self, first, op, out=None, mask=None, accum=None,
                    desc=None):
        """Apply a binary operator with the first operand bound to a
        scalar.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [1, 2])
        >>> print(M.apply_first(10, types.INT64.MINUS))
              0  1
          0|     9|  0
          1|  8   |  1
              0  1
        """
        mask, accum, desc = self._get_args(mask, accum, desc)
        if isinstance(first, Scalar):
            first = first[0]
        ztype = op.ztype(self.type)
        if out is None:
            out = Matrix.sparse(ztype, self._nrows, self._ncols)
        if self._is_huge:
            return self._apply_bound_sparse(op, first, True, out, mask,
                                            accum, desc)
        v, m = self._dense_pair()
        tv, tm = dk.apply_binary_bound(v, m, self.type._coerce(first), op,
                                       ztype._jnp_dtype(), True)
        return self._writeback(out, tv, tm, mask, accum, desc)

    def apply_second(self, op, second, out=None, mask=None, accum=None,
                     desc=None):
        """Apply a binary operator with the second operand bound to a
        scalar.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [1, 2])
        >>> print(M.apply_second(types.INT64.MINUS, 10))
              0  1
          0|    -9|  0
          1| -8   |  1
              0  1
        """
        mask, accum, desc = self._get_args(mask, accum, desc)
        if isinstance(second, Scalar):
            second = second[0]
        ztype = op.ztype(self.type)
        if out is None:
            out = Matrix.sparse(ztype, self._nrows, self._ncols)
        if self._is_huge:
            return self._apply_bound_sparse(op, second, False, out, mask,
                                            accum, desc)
        v, m = self._dense_pair()
        tv, tm = dk.apply_binary_bound(v, m, self.type._coerce(second), op,
                                       ztype._jnp_dtype(), False)
        return self._writeback(out, tv, tm, mask, accum, desc)

    def _apply_bound_sparse(self, op, scalar, bind_first, out, mask,
                            accum, desc):
        """apply_first/apply_second on COO triples."""
        r, c, v = self._coo()
        s = jnp.asarray(self.type._coerce(scalar))
        vj = jnp.asarray(v)
        if op.positional:
            pos = dict(i0=jnp.asarray(r), j0=jnp.asarray(c),
                       i1=jnp.asarray(r), j1=jnp.asarray(c))
            z = op.apply(vj, vj, pos)
        elif bind_first:
            z = op.apply(s.astype(vj.dtype), vj)
        else:
            z = op.apply(vj, s.astype(vj.dtype))
        return self._coo_writeback(
            out, r, c, np.asarray(z).astype(out.type._numpy_t),
            mask, accum, desc)

    @_timed("Matrix.select")
    def select(self, op, thunk=None, out=None, mask=None, accum=None,
               desc=None):
        """Select elements matching a predicate.  `op` may be a SelectOp,
        a string from the table below, or 'min'/'max'.

        `>` `<` `>=` `<=` `!=` `==` (vs thunk), `>0` `<0` `>=0` `<=0`
        `!=0` `==0` (vs zero).

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [-42, 0, 149])
        >>> print(M.select('>', 0))
              0  1  2
          0|         |  0
          1|         |  1
          2|149      |  2
              0  1  2
        >>> print(M.select('<0'))
              0  1  2
          0|   -42   |  0
          1|         |  1
          2|         |  2
              0  1  2
        >>> M.select('!=0').nvals
        2
        """
        if out is None:
            out = Matrix.sparse(self.type, self.nrows, self.ncols)
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
        if op.name in ("TRIL", "TRIU", "DIAG", "OFFDIAG"):
            thunk = np.int64(thunk)  # positional offset, not a value
        else:
            thunk = self.type._coerce(thunk)
        mask, accum, desc = self._get_args(mask, accum, desc)
        if self._is_huge:
            r, c, v = self._coo()
            if desc.inp0:
                r, c, v = ck.build(c, r, v, v.dtype)
            max_r = int(r[-1]) if len(r) else 0
            max_c = int(c.max()) if len(c) else 0
            if (v.dtype.kind in "biuf" and getattr(op, "fn", None)
                    is not None and dw.eligible(
                        len(r), 0, max_r, max_c, v.dtype, v.dtype)):
                # device sort-compaction keeps the whole predicate +
                # stream compaction on chip (reference: GxB_select,
                # matrix.py:2136)
                burble("select: device sort engine (%d nnz)", len(r))
                r2, c2, v2 = dw.select(r, c, v, op.apply,
                                       (op, v.dtype.str), thunk)
                return self._coo_writeback(
                    out, r2, c2, v2.astype(out.type._numpy_t),
                    mask, accum, desc)
            keep = np.asarray(op.apply(jnp.asarray(r), jnp.asarray(c),
                                       jnp.asarray(v), thunk))
            return self._coo_writeback(
                out, r[keep], c[keep], v[keep].astype(out.type._numpy_t),
                mask, accum, desc)
        v, m = self._dense_pair(desc.inp0)
        tv, tm = dk.select(v, m, thunk, op)
        return self._writeback(out, tv, tm, mask, accum, desc)

    def tril(self, offset=None):
        """Lower triangular selection.

        >>> M = Matrix.dense(types.UINT8, 2, 2, fill=1)
        >>> print(M.tril())
              0  1
          0|  1   |  0
          1|  1  1|  1
              0  1
        """
        from . import selectop

        return self.select(selectop.TRIL, thunk=offset)

    def triu(self, offset=None):
        """Upper triangular selection.

        >>> M = Matrix.dense(types.UINT8, 2, 2, fill=1)
        >>> print(M.triu())
              0  1
          0|  1  1|  0
          1|     1|  1
              0  1
        >>> print(M.triu(1))
              0  1
          0|     1|  0
          1|      |  1
              0  1
        """
        from . import selectop

        return self.select(selectop.TRIU, thunk=offset)

    def diag(self, offset=None):
        """Diagonal selection.

        >>> M = Matrix.dense(types.UINT8, 2, 2, fill=3)
        >>> print(M.diag())
              0  1
          0|  3   |  0
          1|     3|  1
              0  1
        """
        from . import selectop

        return self.select(selectop.DIAG, thunk=offset)

    def offdiag(self, offset=None):
        """Off-diagonal selection.

        >>> M = Matrix.dense(types.UINT8, 2, 2, fill=3)
        >>> print(M.offdiag())
              0  1
          0|     3|  0
          1|  3   |  1
              0  1
        """
        from . import selectop

        return self.select(selectop.OFFDIAG, thunk=offset)

    def nonzero(self):
        """Select the non-zero entries.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [42, 0])
        >>> M.nonzero().nvals
        1
        """
        from . import selectop

        return self.select(selectop.NONZERO)

    def vector_diag(self, k=0, desc=None):
        """Extract diagonal k as a Vector (GxB_Vector_diag parity).

        >>> M = Matrix.dense(types.UINT8, 2, 2, fill=7)
        >>> print(M.vector_diag())
        0| 7
        1| 7
        """
        from .vector import Vector

        if k >= 0:
            n = min(self._nrows, self._ncols - k)
        else:
            n = min(self._nrows + k, self._ncols)
        n = max(n, 0)
        out = Vector.sparse(self.type, n)
        if self._is_huge:
            r, c, v = self._coo()
            sel = (c - r) == k
            idx = r[sel] if k >= 0 else c[sel]
            keep = idx < n
            return out._coo_writeback(out, idx[keep], v[sel][keep],
                                      None, None, Default)
        v, m = self._dense_pair()
        idx = jnp.arange(n)
        if k >= 0:
            dv, dm = v[idx, idx + k], m[idx, idx + k]
        else:
            dv, dm = v[idx - k, idx], m[idx - k, idx]
        out._set_dense(dv, dm)
        return out

    # ------------------------------------------------------------------
    # reductions
    # ------------------------------------------------------------------

    def _reduce_pair(self):
        """(vals, mask) arrays for reduction: dense pair, or the COO value
        vector (every stored value present) for huge matrices."""
        if self._is_huge:
            _, _, v = self._coo()
            vj = jnp.asarray(v) if v.size else \
                jnp.zeros((1,), self.type._jnp_dtype())
            mj = jnp.ones(vj.shape, jnp.bool_) if v.size else \
                jnp.zeros((1,), jnp.bool_)
            return vj, mj
        return self._dense_pair()

    def reduce_bool(self, mon=None, mask=None, accum=None, desc=None):
        """Reduce to a boolean with the given monoid (default LOR).

        >>> M = Matrix.from_lists([0, 1], [1, 0], [True, False])
        >>> M.reduce_bool()
        True
        """
        if mon is None:
            mon = current_monoid.get(None) or types.BOOL.LOR_MONOID
        _, accum, desc = self._get_args(None, accum, desc)
        v, m = self._reduce_pair()
        r = dk.reduce_all(v.astype(jnp.bool_) if v.dtype != jnp.bool_
                          else v, m, mon)
        return bool(_reduce_accum(accum, r, np.bool_))

    def reduce_int(self, mon=None, mask=None, accum=None, desc=None):
        """Reduce to an int with the given monoid (default PLUS).

        >>> M = Matrix.from_lists([0, 1], [1, 0], [4, 5])
        >>> M.reduce_int()
        9
        """
        if mon is None:
            mon = current_monoid.get(None) or types.INT64.PLUS_MONOID
        _, accum, desc = self._get_args(None, accum, desc)
        v, m = self._reduce_pair()
        r = dk.reduce_all(v.astype(jnp.int64), m, mon)
        return int(_reduce_accum(accum, r, np.int64))

    def reduce_float(self, mon=None, mask=None, accum=None, desc=None):
        """Reduce to a float with the given monoid (default PLUS).

        >>> M = Matrix.from_lists([0, 1], [1, 0], [1.5, 2.5])
        >>> M.reduce_float()
        4.0
        """
        if mon is None:
            mon = current_monoid.get(None) or self.type.PLUS_MONOID
        _, accum, desc = self._get_args(None, accum, desc)
        v, m = self._reduce_pair()
        r = dk.reduce_all(v.astype(jnp.float64), m, mon)
        return float(_reduce_accum(accum, r, np.float64))

    def reduce(self, mon=None, accum=None, desc=None):
        """Type-generic reduce to a scalar of this matrix's type.

        >>> M = Matrix.from_lists([0, 1], [1, 0], [4, 5])
        >>> M.reduce()
        9
        """
        if mon is None:
            mon = current_monoid.get(None)
            if mon is None:
                mon = getattr(self.type,
                              self.type._default_addop().op + "_MONOID")
        _, accum, desc = self._get_args(None, accum, desc)
        v, m = self._reduce_pair()
        r = np.asarray(dk.reduce_all(v, m, mon)).astype(self.type._numpy_t)
        return self.type._to_value(
            np.asarray(_reduce_accum(accum, r, self.type._numpy_t))
            .astype(self.type._numpy_t))

    @_timed("Matrix.reduce_vector")
    def reduce_vector(self, mon=None, out=None, cast=None, mask=None,
                      accum=None, desc=None):
        """Reduce rows to a Vector (or columns with desc=T0).

        >>> M = Matrix.from_lists([0, 0, 1], [0, 1, 0], [1, 2, 3])
        >>> print(M.reduce_vector())
        0| 3
        1| 3
        >>> print(M.reduce_vector(types.INT64.MAX_MONOID))
        0| 2
        1| 3
        """
        from .vector import Vector

        mask, accum, desc = self._get_args(mask, accum, desc)
        typ = cast or self.type
        if mon is None:
            mon = current_monoid.get(None)
            if mon is None:
                mon = getattr(typ, typ._default_addop().op + "_MONOID")
        if out is None:
            out = Vector.sparse(typ, self._ncols if desc.inp0 else self._nrows)
        if self._is_huge:
            from .core import sparse as sk

            if out._fits_bitmap(out.size, out.type):
                rows, cols, vals = self._device_coo()
                ids = cols if desc.inp0 else rows
                tv, tm = sk.coo_segment_reduce(
                    ids, vals, mon, np.dtype(out.type._numpy_t), out.size)
                return out._writeback(out, tv, tm, mask, accum, desc)
            # huge output vector: sparse-output compact segment reduce
            r, c, v = self._coo()
            ids = c if desc.inp0 else r
            uids, red = sk.coo_segment_reduce_compact(
                ids, v, mon, np.dtype(out.type._numpy_t))
            return out._coo_writeback(out, uids, red, mask, accum, desc)
        v, m = self._dense_pair(desc.inp0)
        tv, tm = dk.reduce_axis(v, m, mon, 1)
        return out._writeback(out, tv.astype(out.type._jnp_dtype()), tm,
                              mask, accum, desc)

    # ------------------------------------------------------------------
    # matmul family
    # ------------------------------------------------------------------

    def _resolve_semiring(self, semiring, out_type):
        if semiring is None:
            semiring = current_semiring.get(None)
        if semiring is None:
            semiring = out_type._default_semiring()
        return semiring

    @_timed("Matrix.mxm")
    def mxm(self, other, semiring=None, cast=None, out=None, mask=None,
            accum=None, desc=None):
        """Matrix-matrix multiply with a semiring.

        >>> A = Matrix.from_lists([0, 1], [1, 0], [2, 3])
        >>> print(A.mxm(A))
              0  1
          0|  6   |  0
          1|     6|  1
              0  1
        >>> print(A @ A)
              0  1
          0|  6   |  0
          1|     6|  1
              0  1

        A mask bounds the output pattern; `accum` folds into `out`;
        `desc=T0` multiplies the transpose; a `with` semiring block
        changes the operators of the enclosed `@`:

        >>> A = Matrix.from_lists([0, 0, 1], [0, 1, 1], [1, 2, 3])
        >>> B = Matrix.from_lists([0, 1, 1], [0, 0, 1], [4, 5, 6])
        >>> M = Matrix.from_lists([0], [0], [True], nrows=2, ncols=2)
        >>> print(A.mxm(B, mask=M))
              0  1
          0| 14   |  0
          1|      |  1
              0  1
        >>> C = Matrix.from_lists([0, 1], [0, 1], [10, 20])
        >>> D = Matrix.from_lists([0, 1], [0, 1], [1, 2])
        >>> print(D.mxm(D, out=C, accum=types.INT64.PLUS))
              0  1
          0| 11   |  0
          1|    24|  1
              0  1
        >>> from pygraphblas_tpu.descriptor import T0
        >>> print(A.mxm(B, desc=T0))
              0  1
          0|  4   |  0
          1| 23 18|  1
              0  1
        >>> from pygraphblas_tpu import semiring
        >>> with semiring.MIN_PLUS_INT64:
        ...     print(A @ A)
              0  1
          0|  2  3|  0
          1|     6|  1
              0  1
        """
        if semiring is None:
            semiring = current_semiring.get(None)
        mask, accum, desc = self._get_args(mask, accum, desc)
        anrows = self._ncols if desc.inp0 else self._nrows
        ancols = self._nrows if desc.inp0 else self._ncols
        bnrows = other._ncols if desc.inp1 else other._nrows
        bncols = other._nrows if desc.inp1 else other._ncols
        if ancols != bnrows:
            raise DimensionMismatch(f"mxm: {ancols} != {bnrows}")
        if out is None:
            if cast is not None:
                typ = cast
            elif semiring is not None:
                typ = semiring.ztype
            else:
                typ = promote(self.type, other.type)
            out = Matrix.sparse(typ, anrows, bncols)
        if semiring is None:
            semiring = out.type._default_semiring()
        burble("mxm %s %sx%s @ %sx%s", semiring.name, anrows, ancols,
               bnrows, bncols)
        # known-diagonal operand: every dot product has a single term, so
        # mxm collapses to one fused elementwise broadcast (the DNN bias
        # step Y.mxm(b) with b = Matrix.identity, reference dnn.py:17-19)
        if not semiring.mul_op.positional:
            if other._diag_c:
                return self._mxm_diag(other, semiring, out, mask, accum,
                                      desc, diag_right=True)
            if self._diag_c:
                return other._mxm_diag(self, semiring, out, mask, accum,
                                       desc, diag_right=False)
        if self._is_huge or other._is_huge or out._is_huge:
            return self._sparse_mxm(other, semiring, out, mask, accum, desc)
        av, am = self._dense_pair(desc.inp0)
        bv, bm = other._dense_pair(desc.inp1)
        tv, tm = dk.mxm(av, am, bv, bm, semiring,
                        np.dtype(semiring.ztype._numpy_t))
        return self._writeback(out, tv, tm, mask, accum, desc)

    def _mxm_diag(self, diag, semiring, out, mask, accum, desc,
                  diag_right):
        """mxm against a known-diagonal operand (self is the data
        matrix): each dot product has exactly one term, so the add
        monoid never fires and the product is a fused broadcast of
        mul() over the data pattern restricted to the diagonal's
        present entries."""
        mul = semiring.mul_op
        transposed = desc.inp0 if diag_right else desc.inp1
        if self._is_huge or out._is_huge or diag._is_huge:
            r, c, v = self._coo()
            if transposed:
                r, c, v = ck.build(c, r, v, v.dtype)
            di, _, dvals = diag._coo()
            key = c if diag_right else r
            pos = np.searchsorted(di, key)
            pos_c = np.minimum(pos, max(len(di) - 1, 0))
            found = (pos < len(di)) & (di[pos_c] == key) if len(di) \
                else np.zeros(len(key), bool)
            rv, cv_, vv = r[found], c[found], v[found]
            dv = dvals[pos_c[found]] if len(di) else dvals[:0]
            zt = out.type._numpy_t
            a1, a2 = (vv, dv) if diag_right else (dv, vv)
            prod = np.asarray(mul.apply(
                jnp.asarray(a1.astype(zt)), jnp.asarray(a2.astype(zt))))
            return self._coo_writeback(out, rv, cv_, prod.astype(zt),
                                       mask, accum, desc)
        av, am = self._dense_pair(transposed)
        ddv, ddm = diag._dense_pair()
        dvec = jnp.diagonal(ddv)
        dmask = jnp.diagonal(ddm)
        zt = out.type._jnp_dtype()
        if diag_right:
            z = mul.apply(av.astype(zt), dvec[None, :].astype(zt))
            tm = jnp.logical_and(am, dmask[None, :])
        else:
            z = mul.apply(dvec[:, None].astype(zt), av.astype(zt))
            tm = jnp.logical_and(dmask[:, None], am)
        tv = jnp.where(tm, z.astype(zt), jnp.zeros((), zt))
        return self._writeback(out, tv, tm, mask, accum, desc)

    def _sparse_mxm(self, other, semiring, out, mask, accum, desc):
        """SpGEMM for huge matrices.  With a (non-complement) mask the
        output pattern is bounded by the mask and each result entry is
        one sparse dot product (core/spgemm.py Pallas bucket kernels);
        unmasked (or complement-masked) products go through the
        two-phase symbolic/numeric Gustavson (core/gustavson.py).  The
        sparse writeback then applies the full mask/accum/replace
        semantics."""
        from .core import spgemm as gk
        from .core import gustavson as gus

        # A rows (optionally transposed); effective B
        ra, ca, va = self._coo()
        if desc.inp0:
            ra, ca, va = self._coo_T()
        rb, cb, vb = (other._coo_T() if desc.inp1 else other._coo())
        zt = np.dtype(semiring.ztype._numpy_t)
        if mask is not None and not desc.complement:
            mr, mc = self._mask_pair_set(mask, desc)
            # transpose of the effective B: other itself when inp1
            # already transposed it
            bt_r, bt_c, bt_v = (other._coo() if desc.inp1
                                else other._coo_T())
            r, c, v = gk.masked_spgemm(ra, ca, va, bt_r, bt_c, bt_v,
                                       mr, mc, semiring, zt)
        else:
            m_eff = self._ncols if desc.inp0 else self._nrows
            k_eff = self._nrows if desc.inp0 else self._ncols
            n_eff = other._nrows if desc.inp1 else other._ncols
            r, c, v = gus.spgemm(ra, ca, va, rb, cb, vb, semiring, zt,
                                 dims=(m_eff, k_eff, n_eff))
        return self._coo_writeback(out, r, c,
                                   v.astype(out.type._numpy_t),
                                   mask, accum, desc)

    @_timed("Matrix.mxv")
    def mxv(self, other, semiring=None, cast=None, out=None, mask=None,
            accum=None, desc=None):
        """Matrix-vector multiply.

        >>> A = Matrix.from_lists([0, 1], [1, 0], [2, 3])
        >>> v = Vector.from_list([1, 10])
        >>> print(A.mxv(v))
        0|20
        1| 3

        Any registered semiring may be passed explicitly:

        >>> A = Matrix.from_lists([0, 0, 1], [0, 1, 1], [1, 2, 3])
        >>> w = Vector.from_list([10, 20])
        >>> print(A.mxv(w, semiring=types.INT64.MIN_PLUS))
        0|11
        1|23
        """
        from .vector import Vector

        if semiring is None:
            semiring = current_semiring.get(None)
        mask, accum, desc = self._get_args(mask, accum, desc)
        anrows = self._ncols if desc.inp0 else self._nrows
        ancols = self._nrows if desc.inp0 else self._ncols
        if ancols != other.size:
            raise DimensionMismatch(f"mxv: {ancols} != {other.size}")
        if out is None:
            if cast is not None:
                typ = cast
            elif semiring is not None:
                typ = semiring.ztype
            else:
                typ = promote(self.type, other.type)
            out = Vector.sparse(typ, anrows)
        if semiring is None:
            semiring = out.type._default_semiring()
        if self._fmt == "coo" and not self._fits_bitmap(
                self._nrows, self._ncols, self.type):
            return self._sparse_mxv(other, semiring, out, mask, accum, desc,
                                    transpose=desc.inp0)
        av, am = self._dense_pair(desc.inp0)
        xv, xm = other._dense_pair()
        tv, tm = dk.mxm(av, am, xv[:, None], xm[:, None], semiring,
                        np.dtype(semiring.ztype._numpy_t))
        return out._writeback(out, tv[:, 0], tm[:, 0], mask, accum, desc)

    def _spmv_plan(self, transpose):
        """Slot-major csr8 SpMV plan, cached per orientation (see
        core/csr8.py)."""
        from .core.csr8 import Csr8Plan

        self._flush()  # before touching the cache: flush resets it
        if self._ell_c is None:
            self._ell_c = {}
        key = bool(transpose)
        if key not in self._ell_c:
            r, c, v = self._coo()
            if transpose:
                r, c, v = ck.build(c, r, v, v.dtype)
                self._ell_c[key] = Csr8Plan(r, c, v, self._ncols,
                                            self._nrows)
            else:
                self._ell_c[key] = Csr8Plan(r, c, v, self._nrows,
                                            self._ncols)
        return self._ell_c[key]

    def _xspmv_plan(self, transpose, dtype, async_build=False):
        """Gather-free decode/permute/fold SpMV plan (core/xspmv.py),
        cached per (orientation, dtype).

        With ``async_build``, a cold plan (no memory or disk copy) is
        built in a daemon thread and None is returned immediately — the
        caller runs a planless engine meanwhile and upgrades once the
        build lands (first-touch tiering at GAP scale; the plan build is
        a compile-like cost, minutes at nnz >= 10^7 on one core)."""
        from .core.xspmv import XSpmvPlan

        self._flush()
        if self._ell_c is None:
            self._ell_c = {}
        key = ("x", bool(transpose), np.dtype(dtype).str)
        if key in self._ell_c:
            return self._ell_c[key]
        r, c, v = self._coo()
        if transpose:
            r, c = c, r
            nr, nc = self._ncols, self._nrows
        else:
            nr, nc = self._nrows, self._ncols
        if not async_build:
            self._ell_c[key] = XSpmvPlan.build(r, c, v, nr, nc,
                                               np.dtype(dtype))
            return self._ell_c[key]
        pkey = ("xpath",) + key
        if pkey not in self._ell_c:  # hash once, not per call
            self._ell_c[pkey] = XSpmvPlan.cache_path(r, c, v, nr, nc,
                                                     np.dtype(dtype))
        path = self._ell_c[pkey]
        if path is not None and os.path.exists(path):
            self._ell_c[key] = XSpmvPlan.build(r, c, v, nr, nc,
                                               np.dtype(dtype))
            return self._ell_c[key]
        bkey = ("xbuilding",) + key
        if bkey not in self._ell_c:
            import threading

            # bind the cache dict itself: if the matrix is modified,
            # _flush() swaps in a fresh dict and this (now stale) plan
            # lands in the discarded one — harmless by construction
            cache = self._ell_c

            def _bg():
                try:
                    cache[key] = XSpmvPlan.build(r, c, v, nr, nc,
                                                 np.dtype(dtype))
                except Exception:  # plan build is an optimization only
                    pass
                finally:
                    cache.pop(bkey, None)

            t = threading.Thread(target=_bg, daemon=True,
                                 name="xspmv-plan-build")
            self._ell_c[bkey] = t
            t.start()
        return None

    def _sparse_mxv(self, other, semiring, out, mask, accum, desc,
                    transpose, flip_mul=False):
        """SpMV for huge matrices: the gather-free xspmv pipeline for a
        dense x when its plan is warm (or forced), else the scatter-free
        csr8 gather-pyramid kernel, else COO segment reduce."""
        from .core import sparse as sk
        from .core import csr8 as pk
        from .core import xspmv as xs
        from .base import config

        zt = np.dtype(semiring.ztype._numpy_t)
        # push/pull heuristic: a sparse frontier (stored COO, or dense
        # with few present entries) takes the SpMSpV engine — per-call
        # work O(frontier edges) instead of O(n + nnz)
        x_sparse = (getattr(other, "_fmt", None) == "coo"
                    or (getattr(other, "_fmt", None) == "bitmap"
                        and other.nvals * 64 < other.size))
        if x_sparse:
            fi, fx = other._coo()
            u, s, d, oids, vals = self._host_csr(not transpose)
            from .core.spmspv import spmspv

            uids, red = spmspv(u, s, d, oids, vals, fi, fx, semiring, zt,
                               flip_mul=flip_mul)
            return out._coo_writeback(out, uids,
                                      red.astype(out.type._numpy_t),
                                      mask, accum, desc)
        if getattr(other, "_fmt", None) == "iso" \
                and not other._fits_bitmap(other.size, other.type):
            # O(1) iso operand (out_degree at 2^60 etc.): y = row-reduce
            # of mul(a_ij, c) — no x materialization at any size
            mul = semiring.mul_op
            if mul.positional:
                raise InsufficientSpace(
                    "positional mul against huge iso vectors TBD")
            r, c, v = self._coo()
            ids = c if transpose else r
            a1 = jnp.asarray(v.astype(zt))
            a2 = jnp.asarray(np.full(len(v), other._iso_v, zt))
            if flip_mul:
                a1, a2 = a2, a1
            prod = np.asarray(mul.apply(a1, a2))
            uids, red = sk.coo_segment_reduce_compact(
                ids, prod, semiring.add_monoid, zt)
            return out._coo_writeback(out, uids,
                                      red.astype(out.type._numpy_t),
                                      mask, accum, desc)
        xv, xm = other._dense_pair()
        xkey = ("x", bool(transpose), zt.str)
        use_x = (config.spmv_engine != "csr8"
                 and other.nvals == other.size
                 and xs.supported(semiring, zt, self.nvals)
                 and (config.spmv_engine == "xspmv"
                      or (self._ell_c is not None and xkey in self._ell_c)))
        xplan = None
        if use_x:
            xplan = self._xspmv_plan(transpose, zt)
        elif (config.spmv_plan_async and config.spmv_engine == "auto"
              and other.nvals == other.size
              and xs.supported(semiring, zt, self.nvals)):
            # kick off (or poll) the background plan build: repeated
            # eager SpMV loops upgrade to xspmv once it lands
            xplan = self._xspmv_plan(transpose, zt, async_build=True)
        if xplan is not None:
            tv, tm = xs.xspmv(xplan, xv.astype(zt), semiring, zt,
                              flip_mul=flip_mul)
        elif pk.plan_supported(semiring):
            tv, tm = pk.run_spmv_masked(self._spmv_plan(transpose), xv, xm,
                                        semiring, zt, flip_mul=flip_mul)
        else:
            rows, cols, vals = self._device_coo()
            ids_out, ids_in = (cols, rows) if transpose else (rows, cols)
            tv, tm = sk.coo_spmv(ids_out, ids_in, vals, xv, xm, semiring,
                                 zt, out.size, flip_mul=flip_mul)
        return out._writeback(out, tv, tm, mask, accum, desc)

    def _host_csr(self, in_is_col):
        """Host CSR-style segments over the SpMV in-dimension: returns
        (unique in-ids, starts, degrees, out-ids, vals) with edges
        sorted by in-id.  Cached per orientation (SpMSpV engine)."""
        self._flush()
        if self._ell_c is None:
            self._ell_c = {}
        key = ("hcsr", bool(in_is_col))
        if key not in self._ell_c:
            r, c, v = self._coo()
            if in_is_col:
                ins, outs, vv = ck.build(c, r, v, v.dtype)
            else:
                ins, outs, vv = r, c, v
            u, s, d = np.unique(ins, return_index=True,
                                return_counts=True)
            self._ell_c[key] = (u, s, d, outs, vv)
        return self._ell_c[key]

    def _device_coo(self):
        """Device copies of the canonical COO triples (cached; int32
        indices when dimensions allow, for TPU-native gathers)."""
        self._flush()
        if self._dev_coo_c is not None:
            return self._dev_coo_c
        r, c, v = self._coo()
        idt = np.int32 if max(self._nrows, self._ncols) < 2**31 else np.int64
        self._dev_coo_c = (jnp.asarray(r.astype(idt)),
                           jnp.asarray(c.astype(idt)), jnp.asarray(v))
        return self._dev_coo_c

    def __matmul__(self, other):
        from .vector import Vector

        if isinstance(other, Matrix):
            return self.mxm(other)
        return self.mxv(other)

    def __imatmul__(self, other):
        return self.mxm(other, out=self)

    @_timed("Matrix.kronecker")
    def kronecker(self, other, op=None, cast=None, out=None, mask=None,
                  accum=None, desc=None):
        """Kronecker product with `op` (default TIMES).

        >>> A = Matrix.from_lists([0], [0], [2], 1, 1)
        >>> B = Matrix.from_lists([0, 1], [1, 0], [3, 4])
        >>> print(A.kronecker(B))
              0  1
          0|     6|  0
          1|  8   |  1
              0  1
        """
        mask, accum, desc = self._get_args(mask, accum, desc)
        typ = cast or promote(self.type, other.type)
        if op is None:
            op = current_binop.get(None) or typ.TIMES
        if isinstance(op, Semiring):
            op = op.mul_op
        if isinstance(op, Monoid):
            op = op.binaryop
        a_nr, a_nc = ((self._ncols, self._nrows) if desc.inp0
                      else (self._nrows, self._ncols))
        b_nr, b_nc = ((other._ncols, other._nrows) if desc.inp1
                      else (other._nrows, other._ncols))
        if out is None:
            out = Matrix.sparse(typ, a_nr * b_nr, a_nc * b_nc)
        if self._is_huge or other._is_huge or out._is_huge:
            ra, ca, va = self._coo()
            if desc.inp0:
                ra, ca, va = ck.build(ca, ra, va, va.dtype)
            rb, cb, vb = other._coo()
            if desc.inp1:
                rb, cb, vb = ck.build(cb, rb, vb, vb.dtype)
            dt = out.type._numpy_t
            fn = self._np_binop(op)
            r, c, v = cs.kron(ra, ca, va.astype(dt), rb, cb,
                              vb.astype(dt), b_nr, b_nc, fn, dt)
            return self._coo_writeback(out, r, c, v, mask, accum, desc)
        av, am = self._dense_pair(desc.inp0)
        bv, bm = other._dense_pair(desc.inp1)
        tv, tm = dk.kronecker(av, am, bv, bm, op, out.type._jnp_dtype())
        return self._writeback(out, tv, tm, mask, accum, desc)

    def __pow__(self, exponent):
        if exponent == 0:
            return self.__class__.identity(self.type, self.nrows)
        if exponent == 1:
            return self
        result = self.dup()
        for _ in range(1, exponent):
            result.mxm(self, out=result)
        return result

    def kronpow(self, exponent):
        """Kronecker-power expansion (graph generation).

        >>> I = Matrix.from_lists([0, 0, 1], [0, 1, 1], [1.0, 1.0, 1.0])
        >>> I.kronpow(1).iseq(I)
        True
        >>> I.kronpow(2).shape
        (4, 4)
        >>> I.kronpow(2).nvals
        9
        """
        if exponent == 0:
            return self.__class__.identity(self.type, self.nrows)
        if exponent == 1:
            return self
        result = self.dup()
        for _ in range(1, exponent):
            result = result.kronecker(result)
        return result

    # ------------------------------------------------------------------
    # extract / assign
    # ------------------------------------------------------------------

    def _resolve_index(self, idx, dim_size):
        """Compile an index argument into a host numpy index vector."""
        return np.asarray(self._resolve_iset(idx, dim_size)
                          .indices(dim_size), np.int64)

    def _resolve_iset(self, idx, dim_size):
        """Compile an index argument into an IndexSet (size resolved)."""
        if _is_int(idx):
            iset = _build_range(slice(idx, idx), dim_size - 1)
        else:
            iset = _build_range(idx, dim_size - 1)
        if iset.size is None:
            iset.size = dim_size
        return iset

    @_timed("Matrix.extract_matrix")
    def extract_matrix(self, row_index=None, col_index=None, out=None,
                       mask=None, accum=None, desc=None):
        """Extract a submatrix.  Slices follow GraphBLAS stop-inclusive
        semantics; negative steps select backwards.

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [42, 0, 149])
        >>> print(M.extract_matrix(0, 1))
              0
          0| 42|  0
              0

        Slices are stop-inclusive (``slice(1, 2)`` keeps rows 1 and 2);
        a negative step reverses:

        >>> A = Matrix.from_lists([0, 1, 2], [0, 1, 2], [1, 2, 3])
        >>> print(A.extract_matrix(slice(1, 2), slice(1, 2)))
              0  1
          0|  2   |  0
          1|     3|  1
              0  1
        >>> print(A.extract_matrix(slice(2, 0, -1), None))
              0  1  2
          0|        3|  0
          1|     2   |  1
          2|  1      |  2
              0  1  2
        """
        ta = desc is not None and desc.inp0
        mask, accum, desc = self._get_args(mask, accum, desc)
        result_nrows = self.ncols if ta else self.nrows
        result_ncols = self.nrows if ta else self.ncols
        iset_r = self._resolve_iset(row_index, result_nrows)
        iset_c = self._resolve_iset(col_index, result_ncols)
        if out is None:
            out = self.__class__.sparse(self.type, iset_r.size, iset_c.size)
        if self._is_huge or out._is_huge:
            r, c, v = self._coo()
            if ta:
                r, c, v = ck.build(c, r, v, v.dtype)
            er, ec, ev = cs.extract(r, c, v,
                                    cs.selector(iset_r, result_nrows),
                                    cs.selector(iset_c, result_ncols))
            return self._coo_writeback(out, er, ec,
                                       ev.astype(out.type._numpy_t),
                                       mask, accum, desc)
        I = np.asarray(iset_r.indices(result_nrows), np.int64)
        J = np.asarray(iset_c.indices(result_ncols), np.int64)
        v, m = self._dense_pair(ta)
        tv, tm = dk.gather2d(v, m, jnp.asarray(I), jnp.asarray(J))
        return self._writeback(out, tv.astype(out.type._jnp_dtype()), tm,
                               mask, accum, desc)

    def extract_col(self, col_index, row_slice=None, out=None, mask=None,
                    accum=None, desc=None):
        """Extract a column (or part of it) as a Vector.

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [42, 0, 149])
        >>> print(M.extract_col(0))
        0|
        1|
        2|149
        """
        from .vector import Vector

        ta = desc is not None and desc.inp0
        dim = self.ncols if ta else self.nrows
        iset = self._resolve_iset(row_slice, dim)
        mask, accum, desc = self._get_args(mask, accum, desc)
        if out is None:
            out = Vector.sparse(self.type, iset.size)
        if self._is_huge:
            r, c, v = self._coo()
            if ta:
                r, c, v = ck.build(c, r, v, v.dtype)
            sel = c == col_index
            rows, vals = r[sel], v[sel]
            ent, pos = cs.selector(iset, dim).select(rows)
            ti, tv = pos, vals[ent]
            order = np.argsort(ti, kind="stable")
            return out._coo_writeback(out, ti[order],
                                      tv[order].astype(out.type._numpy_t),
                                      mask, accum, desc)
        I = np.asarray(iset.indices(dim), np.int64)
        v, m = self._dense_pair(ta)
        tv = v[jnp.asarray(I), col_index]
        tm = m[jnp.asarray(I), col_index]
        return out._writeback(out, tv.astype(out.type._jnp_dtype()), tm,
                              mask, accum, desc)

    def extract_row(self, row_index, col_slice=None, out=None, mask=None,
                    accum=None, desc=None):
        """Extract a row (or part of it) as a Vector.

        >>> M = Matrix.from_lists([0, 1, 2], [1, 2, 0], [42, 0, 149])
        >>> print(M.extract_row(0))
        0|
        1|42
        2|

        A column slice (stop-inclusive) extracts part of the row:

        >>> A = Matrix.from_lists([0, 0, 0], [0, 1, 2], [1, 2, 3])
        >>> print(A.extract_row(0, slice(1, 2)))
        0| 2
        1| 3
        """
        desc2 = desc if desc is not None else Default
        flipped = desc2 & T0 if not desc2.inp0 else desc2
        # row extract == column extract of the transpose
        return self.extract_col(row_index, col_slice, out, mask=mask,
                                accum=accum, desc=flipped)

    def assign_col(self, col_index, value, row_slice=None, mask=None,
                   accum=None, desc=None):
        """Assign a Vector to a column (or part of it).

        >>> M = Matrix.sparse(types.INT64, 3, 3)
        >>> M.assign_col(1, Vector.from_list([9, 8, 7]))
        >>> print(M)
              0  1  2
          0|     9   |  0
          1|     8   |  1
          2|     7   |  2
              0  1  2

        A row slice assigns into part of the column:

        >>> N = Matrix.sparse(types.INT64, 3, 3)
        >>> N.assign_col(0, Vector.from_list([7, 8]), slice(0, 1))
        >>> print(N)
              0  1  2
          0|  7      |  0
          1|  8      |  1
          2|         |  2
              0  1  2
        """
        mask, accum, desc = self._get_args(mask, accum, desc)
        stop_val = self.ncols if desc.inp0 else self.nrows
        iset = self._resolve_iset(row_slice, stop_val)
        if iset.size != value.size:
            raise DimensionMismatch("assign_col length mismatch")
        if self._is_huge:
            return self._assign_line_sparse(value, iset, stop_val,
                                            col_index, mask, accum, desc,
                                            is_col=True)
        I = np.asarray(iset.indices(stop_val), np.int64)
        self._flush()
        v, m = self._dense_pair()
        xv, xm = value._dense_pair()
        if mask is not None:
            mv, mm = mask._dense_pair() if isinstance(mask, Matrix) else \
                mask._dense_pair()
            w = dk.effective_mask(mv, mm, desc.complement, desc.structural)
            if w.ndim == 2:
                w = w[:, col_index]
            xm = jnp.logical_and(xm, w[jnp.asarray(I)])
        idx = jnp.asarray(I)
        cur_m = m[idx, col_index]
        new_v = jnp.where(xm, xv.astype(v.dtype), v[idx, col_index])
        if accum is not None:
            both = jnp.logical_and(cur_m, xm)
            new_v = jnp.where(both,
                              accum.apply(v[idx, col_index],
                                          xv.astype(v.dtype)).astype(v.dtype),
                              new_v)
        new_m = jnp.logical_or(cur_m, xm) if not desc.replace else xm
        self._set_dense(v.at[idx, col_index].set(new_v),
                        m.at[idx, col_index].set(new_m))

    def assign_row(self, row_index, value, col_slice=None, mask=None,
                   accum=None, desc=None):
        """Assign a Vector to a row (or part of it).

        >>> M = Matrix.sparse(types.INT64, 3, 3)
        >>> M.assign_row(1, Vector.from_list([9, 8, 7]))
        >>> print(M)
              0  1  2
          0|         |  0
          1|  9  8  7|  1
          2|         |  2
              0  1  2

        A column slice assigns into part of the row:

        >>> N = Matrix.sparse(types.INT64, 3, 3)
        >>> N.assign_row(1, Vector.from_list([4, 5]), slice(1, 2))
        >>> print(N)
              0  1  2
          0|         |  0
          1|     4  5|  1
          2|         |  2
              0  1  2
        """
        mask, accum, desc = self._get_args(mask, accum, desc)
        iset = self._resolve_iset(col_slice, self.ncols)
        if iset.size != value.size:
            raise DimensionMismatch("assign_row length mismatch")
        if self._is_huge:
            return self._assign_line_sparse(value, iset, self.ncols,
                                            row_index, mask, accum, desc,
                                            is_col=False)
        J = np.asarray(iset.indices(self.ncols), np.int64)
        self._flush()
        v, m = self._dense_pair()
        xv, xm = value._dense_pair()
        if mask is not None:
            mv, mm = mask._dense_pair()
            w = dk.effective_mask(mv, mm, desc.complement, desc.structural)
            if w.ndim == 2:
                w = w[row_index, :]
            xm = jnp.logical_and(xm, w[jnp.asarray(J)])
        idx = jnp.asarray(J)
        cur_m = m[row_index, idx]
        new_v = jnp.where(xm, xv.astype(v.dtype), v[row_index, idx])
        if accum is not None:
            both = jnp.logical_and(cur_m, xm)
            new_v = jnp.where(both,
                              accum.apply(v[row_index, idx],
                                          xv.astype(v.dtype)).astype(v.dtype),
                              new_v)
        new_m = jnp.logical_or(cur_m, xm) if not desc.replace else xm
        self._set_dense(v.at[row_index, idx].set(new_v),
                        m.at[row_index, idx].set(new_m))

    def _assign_line_sparse(self, value, iset, dim, fixed_index, mask,
                            accum, desc, is_col):
        """Sparse-path row/column assign: a 1-wide assign_region along
        the fixed row (is_col=False) or column (is_col=True)."""
        self._flush()
        ti, tv = value._coo()
        cr, cc, cv = self._coo()
        mpr = mpc = None
        if mask is not None:
            if isinstance(mask, Matrix):
                mpr, mpc = self._mask_pair_set(mask, desc)
            else:
                # vector mask lives along the assigned line; lift it into
                # C coordinates so the region mapping filters it
                mi, mv = mask._coo()
                ii, jj = ((mi, np.full_like(mi, fixed_index)) if is_col
                          else (np.full_like(mi, fixed_index), mi))
                mpr, mpc = cs.mask_pairs(ii, jj, mv, desc.structural)
        accum_fn = self._np_binop(accum) if accum is not None else None
        line_sel = cs.ArithSelector(fixed_index, 1, 1)
        span_sel = cs.selector(iset, dim)
        zero = np.zeros_like(ti)
        if is_col:
            args = (ti, zero, span_sel, line_sel)
        else:
            args = (zero, ti, line_sel, span_sel)
        nr, nc, nv = cs.assign_region(
            cr, cc, cv, args[0], args[1], tv.astype(self.type._numpy_t),
            args[2], args[3], mpr, mpc, accum_fn, desc.complement,
            desc.replace, self.type._numpy_t)
        self._set_coo(nr, nc, nv)

    @_timed("Matrix.assign_matrix")
    def assign_matrix(self, value, rindex=None, cindex=None, mask=None,
                      accum=None, desc=None):
        """Assign a submatrix (GrB_Matrix_assign parity).

        >>> M = Matrix.sparse(types.INT64, 3, 3)
        >>> M.assign_matrix(Matrix.identity(types.INT64, 3))
        >>> print(M)
              0  1  2
          0|  1      |  0
          1|     1   |  1
          2|        1|  2
              0  1  2
        """
        mask, accum, desc = self._get_args(mask, accum, desc)
        iset_r = self._resolve_iset(rindex, self.nrows)
        iset_c = self._resolve_iset(cindex, self.ncols)
        if iset_r.size != value.nrows or iset_c.size != value.ncols:
            raise DimensionMismatch("assign shape mismatch")
        if self._is_huge or value._is_huge:
            self._flush()
            tr, tc, tv = value._coo()
            if desc.inp0:
                tr, tc, tv = ck.build(tc, tr, tv, tv.dtype)
            full = (iset_r.kind == IndexSet.ALL
                    and iset_c.kind == IndexSet.ALL
                    and (iset_r.size, iset_c.size) == self.shape)
            if full:
                self._coo_writeback(self, tr, tc,
                                    tv.astype(self.type._numpy_t),
                                    mask, accum, desc)
                return
            cr, cc, cv = self._coo()
            mpr, mpc = self._mask_pair_set(mask, desc)
            accum_fn = self._np_binop(accum) if accum is not None else None
            nr, nc, nv = cs.assign_region(
                cr, cc, cv, tr, tc, tv.astype(self.type._numpy_t),
                cs.selector(iset_r, self.nrows),
                cs.selector(iset_c, self.ncols),
                mpr, mpc, accum_fn, desc.complement, desc.replace,
                self.type._numpy_t)
            self._set_coo(nr, nc, nv)
            return
        I = np.asarray(iset_r.indices(self.nrows), np.int64)
        J = np.asarray(iset_c.indices(self.ncols), np.int64)
        self._flush()
        xv, xm = value._dense_pair(desc.inp0)
        if (len(I), len(J)) == self.shape and \
                np.array_equal(I, np.arange(self.nrows)) and \
                np.array_equal(J, np.arange(self.ncols)):
            # full-matrix assign goes through the standard writeback
            self._writeback(self, xv.astype(self.type._jnp_dtype()), xm,
                            mask, accum, desc)
            return
        v, m = self._dense_pair()
        # scatter the subassignment region (mask applies to the full C in
        # GrB_assign; subset masks are applied against the region here)
        sub_v = v[jnp.asarray(I)][:, jnp.asarray(J)]
        sub_m = m[jnp.asarray(I)][:, jnp.asarray(J)]
        nv, nm = dk.writeback(sub_v, sub_m, xv.astype(v.dtype), xm,
                              *(self._region_mask(mask, I, J, desc)),
                              accum=accum, complement=desc.complement,
                              structural=desc.structural,
                              replace=desc.replace)
        v2, m2 = dk.scatter2d(v, m, jnp.asarray(I), jnp.asarray(J), nv, nm)
        self._set_dense(v2, m2)

    def _region_mask(self, mask, I, J, desc):
        if mask is None:
            return None, None
        mv, mm = mask._dense_pair()
        if mv.shape == self.shape:
            mv = mv[jnp.asarray(I)][:, jnp.asarray(J)]
            mm = mm[jnp.asarray(I)][:, jnp.asarray(J)]
        return mv, mm

    assign = assign_matrix

    @_timed("Matrix.assign_scalar")
    def assign_scalar(self, value, row_slice=None, col_slice=None, mask=None,
                      accum=None, desc=None):
        """Assign a scalar to a region of the Matrix.

        >>> M = Matrix.sparse(types.BOOL, 3, 3)
        >>> M.assign_scalar(True, 1)
        >>> print(M)
              0  1  2
          0|         |  0
          1|  t  t  t|  1
          2|         |  2
              0  1  2

        With a mask, only the mask's pattern is written:

        >>> A = Matrix.sparse(types.INT64, 2, 2)
        >>> W = Matrix.from_lists([0, 1], [0, 1], [True, True])
        >>> A.assign_scalar(5, mask=W)
        >>> print(A)
              0  1
          0|  5   |  0
          1|     5|  1
              0  1
        """
        mask, accum, desc = self._get_args(mask, accum, desc)
        iset_r = self._resolve_iset(row_slice, self.nrows)
        iset_c = self._resolve_iset(col_slice, self.ncols)
        if self._is_huge:
            return self._assign_scalar_sparse(value, iset_r, iset_c, mask,
                                              accum, desc)
        self._flush()
        v, m = self._dense_pair()
        if iset_r.kind == "all" and iset_c.kind == "all":
            tv = jnp.full(self.shape, self.type._coerce(value), v.dtype)
            tm = jnp.ones(self.shape, jnp.bool_)
            self._writeback(self, tv, tm, mask, accum, desc)
            return
        I = np.asarray(iset_r.indices(self.nrows), np.int64)
        J = np.asarray(iset_c.indices(self.ncols), np.int64)
        tv = jnp.full((len(I), len(J)), self.type._coerce(value),
                      v.dtype)
        tm = jnp.ones((len(I), len(J)), jnp.bool_)
        sub_v = v[jnp.asarray(I)][:, jnp.asarray(J)]
        sub_m = m[jnp.asarray(I)][:, jnp.asarray(J)]
        nv, nm = dk.writeback(sub_v, sub_m, tv, tm,
                              *(self._region_mask(mask, I, J, desc)),
                              accum=accum, complement=desc.complement,
                              structural=desc.structural,
                              replace=desc.replace)
        v2, m2 = dk.scatter2d(v, m, jnp.asarray(I), jnp.asarray(J), nv, nm)
        self._set_dense(v2, m2)

    # budget (cells) for materializing a scalar-fill region on the sparse
    # path; independent of bitmap_max_cells so forced-COO configurations
    # keep full assign semantics on small shapes
    _SCALAR_FILL_BUDGET = 1 << 24

    def _assign_scalar_sparse(self, value, iset_r, iset_c, mask, accum,
                              desc):
        """Scalar assign on a huge matrix: masked full-region fills take
        the mask's pattern (the reference's ``Y[M] = 32`` idiom at any
        scale); bounded regions materialize; unbounded unmasked fills
        cannot be enumerated."""
        self._flush()
        val = self.type._coerce(value)
        full = (iset_r.kind == IndexSet.ALL and iset_c.kind == IndexSet.ALL)
        cells = iset_r.size * iset_c.size
        if full and mask is not None and not desc.complement:
            # T = scalar at every true mask position
            mpr, mpc = self._mask_pair_set(mask, desc)
            tv = np.full(len(mpr), val, self.type._numpy_t)
            self._coo_writeback(self, mpr, mpc, tv, mask, accum, desc)
            return
        if cells > self._SCALAR_FILL_BUDGET:
            raise InsufficientSpace(
                "unbounded scalar fill on a huge matrix requires a mask "
                "(the fill pattern cannot be enumerated)")
        I = np.repeat(np.arange(iset_r.size, dtype=np.int64), iset_c.size)
        J = np.tile(np.arange(iset_c.size, dtype=np.int64), iset_r.size)
        tv = np.full(len(I), val, self.type._numpy_t)
        cr, cc, cv = self._coo()
        mpr, mpc = self._mask_pair_set(mask, desc)
        accum_fn = self._np_binop(accum) if accum is not None else None
        nr, nc, nv = cs.assign_region(
            cr, cc, cv, I, J, tv,
            cs.selector(iset_r, self.nrows),
            cs.selector(iset_c, self.ncols),
            mpr, mpc, accum_fn, desc.complement, desc.replace,
            self.type._numpy_t)
        self._set_coo(nr, nc, nv)

    # ------------------------------------------------------------------
    # comparison operators
    # ------------------------------------------------------------------

    def _full(self):
        B = self.__class__.sparse(self.type, self.nrows, self.ncols)
        B.assign_scalar(self.type.default_one)
        return self.eadd(B, self.type.FIRST)

    def _compare(self, other, op, strop):
        C = self.__class__.sparse(types.BOOL, self.nrows, self.ncols)
        if _is_scalar(other):
            if op(other, 0):
                B = self.__class__.dup(self)
                B[:, :] = other
                self.emult(B, strop, out=C)
                return C
            else:
                self.select(strop, other).apply(types.BOOL.ONE, out=C)
                return C
        elif isinstance(other, Matrix):
            A = self._full()
            B = other._full()
            A.emult(B, strop, out=C)
            return C
        else:
            raise TypeError("Unknown matrix comparison type.")

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
    # arithmetic operator overloads (reference matrix.py:1607-1720)
    # ------------------------------------------------------------------

    def __getattr__(self, name):
        """Look up operators as attributes: M.min_plus(N), M.plus_pair(v)."""
        try:
            attr = getattr(self.type, name)
        except AttributeError:
            raise AttributeError(
                f"Matrix has no attribute or type operator {name}")
        return partial(attr, self)

    def __len__(self):
        """Number of stored elements.

        >>> len(Matrix.from_lists([0], [0], [1]))
        1
        """
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

        >>> A = Matrix.from_lists([0, 1], [0, 1], [1, 2])
        >>> print(A + A)
              0  1
          0|  2   |  0
          1|     4|  1
              0  1
        >>> print(A + 1)
              0  1
          0|  2   |  0
          1|     3|  1
              0  1
        """
        op = current_binop.get(self.type.PLUS)
        if not isinstance(other, Matrix):
            return self.apply_second(op, other)
        return self.eadd(other, op)

    def __radd__(self, other):
        op = current_binop.get(self.type.PLUS)
        if not isinstance(other, Matrix):
            return self.apply_first(other, op)
        return other.eadd(self, op)  # pragma: no cover

    def __iadd__(self, other):
        op = current_binop.get(self.type.PLUS)
        if not isinstance(other, Matrix):
            return self.apply_second(op, other, out=self)
        return self.eadd(other, op, out=self)

    def __sub__(self, other):
        op = current_binop.get(self.type.MINUS)
        if not isinstance(other, Matrix):
            return self.apply_second(op, other)
        return self.eadd(other, op)

    def __rsub__(self, other):
        op = current_binop.get(self.type.MINUS)
        if not isinstance(other, Matrix):
            return self.apply_first(other, op)
        return other.eadd(self, op)  # pragma: no cover

    def __isub__(self, other):
        op = current_binop.get(self.type.MINUS)
        if not isinstance(other, Matrix):
            return self.apply_second(op, other, out=self)
        return self.eadd(other, op, out=self)

    def __mul__(self, other):
        """emult with TIMES; a scalar operand binds apply_second.

        >>> A = Matrix.from_lists([0, 1], [0, 1], [1, 2])
        >>> print(A * 3)
              0  1
          0|  3   |  0
          1|     6|  1
              0  1
        """
        op = current_binop.get(self.type.TIMES)
        if not isinstance(other, Matrix):
            return self.apply_second(op, other)
        return self.emult(other, op)

    def __rmul__(self, other):
        op = current_binop.get(self.type.TIMES)
        if not isinstance(other, Matrix):
            return self.apply_first(other, op)
        return other.emult(self, op)  # pragma: no cover

    def __imul__(self, other):
        op = current_binop.get(self.type.TIMES)
        if not isinstance(other, Matrix):
            return self.apply_second(op, other, out=self)
        return self.emult(other, op, out=self)

    def __truediv__(self, other):
        op = current_binop.get(self.type.DIV)
        if not isinstance(other, Matrix):
            return self.apply_second(op, other)
        return self.emult(other, op)

    def __rtruediv__(self, other):
        op = current_binop.get(self.type.DIV)
        if not isinstance(other, Matrix):
            return self.apply_first(other, op)
        return other.emult(self, op)  # pragma: no cover

    def __itruediv__(self, other):
        op = current_binop.get(self.type.DIV)
        if not isinstance(other, Matrix):
            return self.apply_second(op, other, out=self)
        return self.emult(other, op, out=self)

    def __invert__(self):
        """Multiplicative inverse of every element.

        >>> (~Matrix.from_lists([0], [0], [2.0]))[0, 0]
        0.5
        """
        return self.apply(self.type.MINV)

    def __neg__(self):
        """Additive inverse of every element.

        >>> A = Matrix.from_lists([0, 1], [0, 1], [1, 2])
        >>> print(-A)
              0  1
          0| -1   |  0
          1|    -2|  1
              0  1
        """
        return self.apply(self.type.AINV)

    def __abs__(self):
        """Absolute value of every element.

        >>> abs(Matrix.from_lists([0], [0], [-2]))[0, 0]
        2
        """
        return self.apply(self.type.ABS)

    # ------------------------------------------------------------------
    # graph helpers
    # ------------------------------------------------------------------

    def shard(self, mesh, balance=True):
        """Shard this matrix over a ``jax.sharding.Mesh`` with axes
        ("i", "j"); returns a :class:`~.parallel.dist.DistMatrix` whose
        mxv/pagerank/triangle_count run under shard_map with XLA
        collectives over the mesh (the distribution tier, SURVEY §2.3).

        ``balance`` relabels vertices by a fixed random permutation so
        power-law hubs spread across tiles (padded-tile executors
        otherwise run at the max-tile load); outputs are mapped back to
        the original ids transparently.

        Multi-chip TPU execution uses exactly this path; the CPU
        test harness validates it on a virtual 8-device mesh.
        """
        from .parallel.dist import DistMatrix

        return DistMatrix(self, mesh, balance=balance)

    def out_degree(self, typ=types.UINT64, out=None):
        """UINT64 vector of out-degrees.

        >>> M = Matrix.from_lists([0, 1, 0, 2], [1, 2, 2, 0], [42, 0, 3, 149])
        >>> print(M.out_degree())
        0| 2
        1| 1
        2| 1
        """
        from .vector import Vector

        return self.cast(typ).plus_pair(Vector.iso(1, self.nrows), out=out)

    def gini(self, typ=types.FP64):
        """Gini coefficient of the out-degree distribution.

        >>> M = Matrix.random(types.UINT8, 10, 10, 10, seed=42)
        >>> M.gini()
        0.23333333333333334
        """
        arr = self.out_degree(typ).npV
        arr = np.sort(arr)
        n = arr.shape[0]
        index = np.arange(1, n + 1)
        return float((np.sum((2 * index - n - 1) * arr)) / (n * np.sum(arr)))


def _random_value_fn(typ):
    """Value-draw function per type, matching the reference's stdlib-random
    usage so seeded results agree (matrix.py:540-570)."""
    if typ is types.BOOL:
        return partial(_stdlib_random.randint, 0, 1)
    if typ is types.UINT8:
        return partial(_stdlib_random.randint, 0, (2**8) - 1)
    if typ is types.UINT16:
        return partial(_stdlib_random.randint, 0, (2**16) - 1)
    if typ is types.UINT32:
        return partial(_stdlib_random.randint, 0, (2**32) - 1)
    if typ is types.UINT64:
        return partial(_stdlib_random.randint, 0, (2**64) - 1)
    if typ is types.INT8:
        return partial(_stdlib_random.randint, (-(2**7)) + 1, (2**7) - 1)
    if typ is types.INT16:
        return partial(_stdlib_random.randint, (-(2**15)) + 1, (2**15) - 1)
    if typ is types.INT32:
        return partial(_stdlib_random.randint, (-(2**31)) + 1, (2**31) - 1)
    if typ is types.INT64:
        return partial(_stdlib_random.randint, (-(2**63)) + 1, (2**63) - 1)
    if typ in (types.FP32, types.FP64):
        return _stdlib_random.random
    if typ in (types.FC32, types.FC64):
        return lambda: complex(_stdlib_random.random(),
                               _stdlib_random.random())
    raise TypeError(f"no random generator for {typ}")


# deferred import to avoid a cycle
from .vector import Vector  # noqa: E402
