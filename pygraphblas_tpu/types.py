"""GraphBLAS type system on JAX dtypes, including User Defined Types.

The 13 built-in scalar types (BOOL, signed/unsigned ints 8-64, FP32/64,
FC32/64) are Python classes carrying a jnp dtype, default semiring/ops,
formatting rules, and the promotion lattice.  (Reference semantics:
``pygraphblas/types.py``; promotion order types.py:468-497, BOOL defaults
types.py:190-200.)

User defined types are struct-of-arrays: a UDT declares named members, each
stored as its own device array; user ops over UDTs are plain Python
functions traced by JAX (replacing the reference's numba-cfunc mechanism,
types.py:56-71).
"""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy

__pdoc__ = {}

__all__ = [
    "Type",
    "BOOL",
    "INT8",
    "INT16",
    "INT32",
    "INT64",
    "UINT8",
    "UINT16",
    "UINT32",
    "UINT64",
    "FP32",
    "FP64",
    "FC32",
    "FC64",
    "binop",
    "promote",
]


class MetaType(type):
    """Metaclass registry: name <-> Type class <-> numpy/jnp dtype."""

    _name_type_map = {}
    _dtype_type_map = {}

    def __new__(meta, type_name, bases, attrs):
        if attrs.get("base", False):
            return super().__new__(meta, type_name, bases, attrs)
        cls = super().__new__(meta, type_name, bases, attrs)
        meta._name_type_map[type_name] = cls
        if getattr(cls, "_numpy_t", None) is not None:
            meta._dtype_type_map.setdefault(numpy.dtype(cls._numpy_t).type, cls)
        cls._c_type = attrs.get("_c_type", type_name)
        meta._name_type_map.setdefault(cls._c_type, cls)
        return cls

    @property
    def _dtype_gb_map(cls):
        # parity alias used by from_scipy_sparse-style constructors
        return MetaType._dtype_type_map

    def new_monoid(cls, op, identity):
        """Create a new monoid from a binary op and identity value."""
        from .monoid import Monoid

        m = Monoid(
            op.name.split("_")[0],
            cls.__name__,
            op_obj=op,
            identity=identity,
            attach=False,
        )
        setattr(cls, m.op + "_MONOID", m)
        setattr(cls, m.op.lower() + "_monoid", m)
        return m

    def new_semiring(cls, monoid, op):
        """Create a new semiring from a monoid and a binary op."""
        from .semiring import Semiring

        sr = Semiring(
            monoid.op,
            op.name.split("_")[0],
            cls.__name__,
            add=monoid,
            mul_op=op,
            attach=False,
            type_cls=cls,
        )
        setattr(cls, f"{sr.pls}_{sr.mul}", sr)
        setattr(cls, f"{sr.pls}_{sr.mul}".lower(), sr)
        return sr

    def gb_from_name(cls, name):
        return MetaType._name_type_map[name]

    def __repr__(cls):
        return f"<class 'pygraphblas_tpu.types.{cls.__name__}'>"


def _gb_from_dtype(dtype):
    """numpy/jnp dtype -> Type class."""
    return MetaType._dtype_type_map[numpy.dtype(dtype).type]


class Type(metaclass=MetaType):
    """Base class for GraphBLAS types."""

    default_one = 1
    """The default value used to represent 1 for filling in types."""
    default_zero = 0
    """The default value used to represent 0 for filling in types."""
    base = True
    _typecode = None
    _numpy_t = None
    _allows_bitmap = True   # struct UDTs override: COO/host tier only
    members = None  # UDTs override

    @classmethod
    def format_value(cls, val, width=2, prec=None):
        """Return the value as a formatted string for display."""
        return f"{val:{width}}"

    @classmethod
    def _default_addop(cls):
        return cls.PLUS

    @classmethod
    def _default_multop(cls):
        return cls.TIMES

    @classmethod
    def _default_semiring(cls):
        return cls.PLUS_TIMES

    @classmethod
    def _jnp_dtype(cls):
        return jnp.dtype(cls._numpy_t)

    @classmethod
    def _from_value(cls, value):
        return value

    @classmethod
    def _to_value(cls, data):
        """Convert a raw array element to a Python scalar."""
        return data.item() if hasattr(data, "item") else data

    @classmethod
    def _coerce(cls, value):
        """Coerce a Python value into this type's numpy scalar."""
        return numpy.dtype(cls._numpy_t).type(value)


class BOOL(Type):
    """GraphBLAS Boolean Type."""

    _c_type = "_Bool"
    default_one = True
    default_zero = False
    _typecode = "B"
    _numpy_t = numpy.bool_

    @classmethod
    def _default_addop(cls):
        return cls.LOR

    @classmethod
    def _default_multop(cls):
        return cls.LAND

    @classmethod
    def _default_semiring(cls):
        return cls.LOR_LAND

    @classmethod
    def format_value(cls, val, width=2, prec=None):
        f = "{:>%s}" % width
        if not isinstance(val, (bool, numpy.bool_)):
            return f.format(val)
        return f.format("t") if val else f.format("f")

    @classmethod
    def _to_value(cls, data):
        return bool(data)


class INT8(Type):
    """GraphBLAS 8 bit signed integer."""

    _c_type = "int8_t"
    _typecode = "b"
    _numpy_t = numpy.int8


class UINT8(Type):
    """GraphBLAS 8 bit unsigned integer."""

    _c_type = "uint8_t"
    _typecode = "B"
    _numpy_t = numpy.uint8


class INT16(Type):
    """GraphBLAS 16 bit signed integer."""

    _c_type = "int16_t"
    _typecode = "i"
    _numpy_t = numpy.int16


class UINT16(Type):
    """GraphBLAS 16 bit unsigned integer."""

    _c_type = "uint16_t"
    _typecode = "I"
    _numpy_t = numpy.uint16


class INT32(Type):
    """GraphBLAS 32 bit signed integer."""

    _c_type = "int32_t"
    _typecode = "l"
    _numpy_t = numpy.int32


class UINT32(Type):
    """GraphBLAS 32 bit unsigned integer."""

    _c_type = "uint32_t"
    _typecode = "L"
    _numpy_t = numpy.uint32


class INT64(Type):
    """GraphBLAS 64 bit signed integer."""

    _c_type = "int64_t"
    _typecode = "q"
    _numpy_t = numpy.int64


class UINT64(Type):
    """GraphBLAS 64 bit unsigned integer."""

    _c_type = "uint64_t"
    _typecode = "Q"
    _numpy_t = numpy.uint64


class FP32(Type):
    """GraphBLAS 32 bit float."""

    default_one = 1.0
    default_zero = 0.0
    _c_type = "float"
    _typecode = "f"
    _numpy_t = numpy.float32

    @classmethod
    def format_value(cls, val, width=2, prec=2):
        return f"{val:>{width}.{prec}}"


class FP64(Type):
    """GraphBLAS 64 bit float."""

    default_one = 1.0
    default_zero = 0.0
    _c_type = "double"
    _typecode = "d"
    _numpy_t = numpy.float64

    @classmethod
    def format_value(cls, val, width=2, prec=2):
        return f"{val:>{width}.{prec}}"


class FC32(Type):
    """GraphBLAS 32 bit float complex."""

    default_one = complex(1.0)
    default_zero = complex(0.0)
    _c_type = "float _Complex"
    _numpy_t = numpy.complex64


class FC64(Type):
    """GraphBLAS 64 bit float complex."""

    default_one = complex(1.0)
    default_zero = complex(0.0)
    _c_type = "double _Complex"
    _numpy_t = numpy.complex128


def _gb_from_type(typ):
    if typ is int:
        return INT64
    if typ is float:
        return FP64
    if typ is bool:
        return BOOL
    if typ is complex:
        return FC64
    if isinstance(typ, type) and issubclass(typ, numpy.generic):
        return _gb_from_dtype(typ)
    raise TypeError(f"cannot turn {typ!r} into GraphBLAS type.")


def _type_from_value(value):
    """Infer a Type from a Python or numpy scalar value."""
    if isinstance(value, (bool, numpy.bool_)):
        return BOOL
    if isinstance(value, numpy.generic):
        return _gb_from_dtype(value.dtype)
    if isinstance(value, int):
        return INT64
    if isinstance(value, float):
        return FP64
    if isinstance(value, complex):
        return FC64
    raise TypeError(f"cannot infer GraphBLAS type from {value!r}")


# --------------------------------------------------------------------------
# User Defined Types: struct-of-arrays.  A UDT subclass declares `members`
# as a list of "ctype name" strings (API parity with the reference) and each
# member is stored in its own device array of the mapped numpy dtype.
# --------------------------------------------------------------------------

_C_TO_NUMPY = {
    "bool": numpy.bool_,
    "_Bool": numpy.bool_,
    "int8_t": numpy.int8,
    "uint8_t": numpy.uint8,
    "int16_t": numpy.int16,
    "uint16_t": numpy.uint16,
    "int32_t": numpy.int32,
    "uint32_t": numpy.uint32,
    "int64_t": numpy.int64,
    "uint64_t": numpy.uint64,
    "float": numpy.float32,
    "double": numpy.float64,
}


class MetaUDT(MetaType):
    """Metaclass for struct user-defined types.

    ``members = ["double w", "int64_t pi"]`` builds a numpy structured
    dtype; containers store UDT values as structured COO value arrays
    on the host tier (struct-of-arrays on device: each member column
    becomes its own jnp array inside kernels).  The TPU-native
    replacement for GrB_Type_new + numba record mapping (reference
    types.py:56-71).
    """

    def __new__(meta, type_name, bases, attrs):
        if "members" in attrs and attrs["members"]:
            members = [m.split() for m in attrs["members"]]
            attrs["member_def"] = members
            attrs["_member_dtypes"] = {
                name: _C_TO_NUMPY[ctype] for ctype, name in members
            }
            attrs["_base_name"] = "UDT"
            attrs["_numpy_t"] = numpy.dtype(
                [(name, _C_TO_NUMPY[ctype]) for ctype, name in members])
            attrs["_allows_bitmap"] = False

            def _coerce(cls, value):
                if isinstance(value, numpy.void):
                    return value
                return numpy.asarray([tuple(value)], cls._numpy_t)[0]

            def _from_value(cls, value):
                return value

            def _to_value(cls, data):
                return tuple(
                    data[name].item() if hasattr(data[name], "item")
                    else data[name] for _, name in cls.member_def)

            def format_value(cls, val, width=2, prec=None):
                if val == "" or val is None:
                    return f"{'':>{width}}"
                return f"{str(tuple(val)):>{width}}"

            def to_dict(cls, arr):
                """structured numpy array -> dict of member jnp arrays."""
                arr = numpy.asarray(arr)
                return {name: jnp.asarray(arr[name])
                        for _, name in cls.member_def}

            def from_dict(cls, d, n=None):
                """dict of member arrays -> structured numpy array."""
                first = next(iter(d.values()))
                n = len(first) if n is None else n
                out = numpy.empty(n, cls._numpy_t)
                for _, name in cls.member_def:
                    out[name] = numpy.asarray(d[name])
                return out

            attrs.setdefault("_coerce", classmethod(_coerce))
            attrs.setdefault("_from_value", classmethod(_from_value))
            attrs.setdefault("_to_value", classmethod(_to_value))
            attrs.setdefault("format_value", classmethod(format_value))
            attrs.setdefault("to_dict", classmethod(to_dict))
            attrs.setdefault("from_dict", classmethod(from_dict))
        cls = super().__new__(meta, type_name, bases, attrs)
        return cls


def binop(boolean=False):
    """Decorator for defining a UDT binary op as a class member.

    The decorated Python function is traced by JAX at kernel-build time
    (replacing the reference's numba-cfunc registration, types.py:408-439).
    """
    from .binaryop import BinaryOp

    class inner:
        def __init__(self, func):
            self.func = func

        def __set_name__(self, cls, name):
            op = BinaryOp(
                self.func.__name__,
                cls.__name__,
                fn=self.func,
                boolean=boolean,
                udt=cls,
            )
            setattr(cls, self.func.__name__, op)

    return inner


_int_types = (INT8, INT16, INT32, INT64, UINT8, UINT16, UINT32, UINT64)

_float_types = (FP32, FP64)

_promotion_order = (
    FC64,
    FC32,
    FP64,
    FP32,
    INT64,
    UINT64,
    INT32,
    UINT32,
    INT16,
    UINT16,
    INT8,
    UINT8,
)


def promote(left, right):
    """Type promotion: result type of an operation inferred from operands.

    Same lattice as the reference (types.py:468-497): BOOL promotes to the
    other type; otherwise the earlier entry in the order wins.
    """
    if left == right:
        return left
    elif left == BOOL:
        return right
    elif right == BOOL:
        return left
    for t in _promotion_order:
        if left == t or right == t:
            return t
    raise TypeError(
        "inconvertable types %s and %s" % (repr(left), repr(right))
    )  # pragma: no cover
