"""Scalar semantics for every built-in GraphBLAS operator.

Each operator is a plain Python function over jnp arrays, traced into
kernels at jit time.  This replaces the reference's reflection over ~2,000
precompiled SuiteSparse C symbols (``binaryop.py:104-112``,
``unaryop.py:55-62``, ``monoid.py:81-92``, ``semiring.py:87-121``): under
XLA one traced closure per (op, dtype) specializes the same kernel template,
so there is no per-semiring code explosion.

Integer semantics follow C / SuiteSparse conventions: truncating division,
division-by-zero saturates to the type min/max, boolean arithmetic maps
PLUS->OR, TIMES->AND, MINUS->XOR, DIV->FIRST.
"""

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# dtype helpers
# ---------------------------------------------------------------------------

ALL_TYPES = (
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
)
INT_TYPES = ("INT8", "INT16", "INT32", "INT64", "UINT8", "UINT16", "UINT32", "UINT64")
UINT_TYPES = ("UINT8", "UINT16", "UINT32", "UINT64")
FP_TYPES = ("FP32", "FP64")
FC_TYPES = ("FC32", "FC64")
REAL_TYPES = INT_TYPES + FP_TYPES
NONBOOL_TYPES = INT_TYPES + FP_TYPES + FC_TYPES
NONBOOL_REAL = INT_TYPES + FP_TYPES


def _is_bool(x):
    return jnp.issubdtype(x.dtype, jnp.bool_)


def _is_int(x):
    return jnp.issubdtype(x.dtype, jnp.integer)


def _is_uint(x):
    return jnp.issubdtype(x.dtype, jnp.unsignedinteger)


def _is_complex(x):
    return jnp.issubdtype(x.dtype, jnp.complexfloating)


def _iinfo(x):
    return jnp.iinfo(x.dtype)


def _imax(x):
    return jnp.asarray(_iinfo(x).max, x.dtype)


def _imin(x):
    return jnp.asarray(_iinfo(x).min, x.dtype)


def _ones_bits(x):
    """All-bits-set value of x's integer dtype."""
    return jnp.asarray(np.array(-1).astype(np.dtype(x.dtype.name)), x.dtype)


# ---------------------------------------------------------------------------
# C-style arithmetic primitives
# ---------------------------------------------------------------------------


def _idiv(x, y):
    """C truncating integer division with SuiteSparse div-by-zero rules:
    x/0 -> 0 if x==0 else type max (or min for negative x)."""
    safe_y = jnp.where(y == 0, jnp.ones_like(y), y)
    q = jax.lax.div(x, safe_y)
    if _is_uint(x):
        div0 = jnp.where(x == 0, jnp.zeros_like(x), _imax(x))
    else:
        div0 = jnp.where(
            x == 0, jnp.zeros_like(x), jnp.where(x < 0, _imin(x), _imax(x))
        )
    return jnp.where(y == 0, div0, q)


def _div(x, y):
    if _is_bool(x):
        return x  # boolean division == FIRST
    if _is_int(x):
        return _idiv(x, y)
    return x / y


def _minus(x, y):
    if _is_bool(x):
        return jnp.logical_xor(x, y)
    return x - y


def _plus(x, y):
    if _is_bool(x):
        return jnp.logical_or(x, y)
    return x + y


def _times(x, y):
    if _is_bool(x):
        return jnp.logical_and(x, y)
    return x * y


def _min(x, y):
    if _is_bool(x):
        return jnp.logical_and(x, y)
    return jnp.minimum(x, y)  # fmin semantics: NaN loses


def _max(x, y):
    if _is_bool(x):
        return jnp.logical_or(x, y)
    return jnp.maximum(x, y)


def _pow(x, y):
    if _is_bool(x):
        return jnp.logical_or(x, jnp.logical_not(y))  # x**0=1=true, x**1=x
    if _is_int(x):
        # C-style: negative exponent -> integer reciprocal of x**|y|
        mag = jnp.power(x, jnp.abs(y))
        recip = _idiv(jnp.ones_like(mag), mag)
        return jnp.where(y < 0, recip, mag)
    return jnp.power(x, y)


def _bool01(x):
    """truthiness of a value in its own type."""
    if _is_bool(x):
        return x
    return x != 0


def _lor(x, y):
    r = jnp.logical_or(_bool01(x), _bool01(y))
    return r if _is_bool(x) else r.astype(x.dtype)


def _land(x, y):
    r = jnp.logical_and(_bool01(x), _bool01(y))
    return r if _is_bool(x) else r.astype(x.dtype)


def _lxor(x, y):
    r = jnp.logical_xor(_bool01(x), _bool01(y))
    return r if _is_bool(x) else r.astype(x.dtype)


def _lxnor(x, y):
    r = jnp.logical_not(jnp.logical_xor(_bool01(x), _bool01(y)))
    return r if _is_bool(x) else r.astype(x.dtype)


def _bget(x, y):
    return jax.lax.shift_right_logical(x, y.astype(x.dtype)) & jnp.ones_like(x)


def _bset(x, y):
    return x | (jnp.ones_like(x) << y.astype(x.dtype))


def _bclr(x, y):
    return x & ~(jnp.ones_like(x) << y.astype(x.dtype))


def _bshift(x, y):
    # positive y: left shift; negative: logical right shift
    yi = y.astype(jnp.int32)
    left = jax.lax.shift_left(x, jnp.maximum(yi, 0).astype(x.dtype))
    right = jax.lax.shift_right_logical(x, jnp.maximum(-yi, 0).astype(x.dtype))
    return jnp.where(yi >= 0, left, right)


def _remainder(x, y):
    # IEEE remainder: x - round(x/y)*y
    return x - jnp.round(x / y) * y


def _signum(x):
    return jnp.sign(x)


def _minv(x):
    if _is_bool(x):
        return jnp.ones_like(x)
    if _is_int(x):
        return _idiv(jnp.ones_like(x), x)
    return 1.0 / x


def _frexpx(x):
    m, _ = jnp.frexp(x)
    return m


def _frexpe(x):
    _, e = jnp.frexp(x)
    return e.astype(x.dtype)


# ---------------------------------------------------------------------------
# Binary op table.
#
# Entry: name -> (fn, types, ztype_rule)
#   ztype_rule: "T" result is the operand type; "BOOL" boolean result;
#               "CMPLX" FPnn -> FCnn; "POS32"/"POS64" positional int result.
# Positional ops take a `pos` namespace instead of values.
# ---------------------------------------------------------------------------

BINARY = {}


def _defbin(name, fn, types=ALL_TYPES, ztype="T", positional=None):
    BINARY[name] = dict(fn=fn, types=tuple(types), ztype=ztype, positional=positional)


_NO_MINMAX_FC = tuple(t for t in ALL_TYPES if t not in FC_TYPES)

_defbin("FIRST", lambda x, y: x)
_defbin("SECOND", lambda x, y: y)
_defbin("ANY", lambda x, y: y)  # "any" picks an arbitrary operand
_defbin("PAIR", lambda x, y: jnp.ones_like(x))
_defbin("MIN", _min, _NO_MINMAX_FC)
_defbin("MAX", _max, _NO_MINMAX_FC)
_defbin("PLUS", _plus)
_defbin("MINUS", _minus)
_defbin("RMINUS", lambda x, y: _minus(y, x))
_defbin("TIMES", _times)
_defbin("DIV", _div)
_defbin("RDIV", lambda x, y: _div(y, x))
_defbin("POW", _pow, _NO_MINMAX_FC + FC_TYPES)

_defbin("EQ", lambda x, y: x == y, ALL_TYPES, "BOOL")
_defbin("NE", lambda x, y: x != y, ALL_TYPES, "BOOL")
_defbin("GT", lambda x, y: x > y, _NO_MINMAX_FC, "BOOL")
_defbin("LT", lambda x, y: x < y, _NO_MINMAX_FC, "BOOL")
_defbin("GE", lambda x, y: x >= y, _NO_MINMAX_FC, "BOOL")
_defbin("LE", lambda x, y: x <= y, _NO_MINMAX_FC, "BOOL")

# IS* comparators: result in the operand type (used inside semirings)
_defbin("ISEQ", lambda x, y: (x == y).astype(x.dtype), NONBOOL_REAL)
_defbin("ISNE", lambda x, y: (x != y).astype(x.dtype), NONBOOL_REAL)
_defbin("ISGT", lambda x, y: (x > y).astype(x.dtype), NONBOOL_REAL)
_defbin("ISLT", lambda x, y: (x < y).astype(x.dtype), NONBOOL_REAL)
_defbin("ISGE", lambda x, y: (x >= y).astype(x.dtype), NONBOOL_REAL)
_defbin("ISLE", lambda x, y: (x <= y).astype(x.dtype), NONBOOL_REAL)

_defbin("LOR", _lor, _NO_MINMAX_FC)
_defbin("LAND", _land, _NO_MINMAX_FC)
_defbin("LXOR", _lxor, _NO_MINMAX_FC)
_defbin("LXNOR", _lxnor, ("BOOL",))

_defbin("BOR", lambda x, y: x | y, INT_TYPES)
_defbin("BAND", lambda x, y: x & y, INT_TYPES)
_defbin("BXOR", lambda x, y: x ^ y, INT_TYPES)
_defbin("BXNOR", lambda x, y: ~(x ^ y), INT_TYPES)
_defbin("BGET", _bget, INT_TYPES)
_defbin("BSET", _bset, INT_TYPES)
_defbin("BCLR", _bclr, INT_TYPES)
_defbin("BSHIFT", _bshift, INT_TYPES)

_defbin("ATAN2", jnp.arctan2, FP_TYPES)
_defbin("HYPOT", jnp.hypot, FP_TYPES)
_defbin("FMOD", jnp.fmod, FP_TYPES)
_defbin("REMAINDER", _remainder, FP_TYPES)
_defbin("LDEXP", lambda x, y: jnp.ldexp(x, y.astype(jnp.int32)), FP_TYPES)
_defbin("COPYSIGN", jnp.copysign, FP_TYPES)
_defbin("CMPLX", lambda x, y: jax.lax.complex(x, y), FP_TYPES, "CMPLX")

# Positional ops: fn(pos) where pos has i0/j0 (first operand's indices) and
# i1/j1 (second operand's), already as int arrays broadcast to output shape.
for _name, _key, _off in (
    ("FIRSTI", "i0", 0),
    ("FIRSTI1", "i0", 1),
    ("FIRSTJ", "j0", 0),
    ("FIRSTJ1", "j0", 1),
    ("SECONDI", "i1", 0),
    ("SECONDI1", "i1", 1),
    ("SECONDJ", "j1", 0),
    ("SECONDJ1", "j1", 1),
):
    _defbin(
        _name,
        None,
        ("INT32", "INT64"),
        "T",
        positional=(_key, _off),
    )


# ---------------------------------------------------------------------------
# Unary op table: name -> (fn, types, ztype_rule)
# ---------------------------------------------------------------------------

UNARY = {}


def _defun(name, fn, types=ALL_TYPES, ztype="T"):
    UNARY[name] = dict(fn=fn, types=tuple(types), ztype=ztype)


def _abs(x):
    return x if _is_bool(x) else jnp.abs(x)


def _ainv(x):
    if _is_bool(x):
        return x
    if _is_uint(x):
        # C unsigned negation wraps
        return (-x.astype(jnp.dtype("int64"))).astype(x.dtype)
    return -x


_defun("IDENTITY", lambda x: x)
_defun("AINV", _ainv)
_defun("MINV", _minv)
_defun("ONE", lambda x: jnp.ones_like(x))
_defun("ABS", _abs, ALL_TYPES, "ABSZ")
_defun("LNOT", lambda x: jnp.logical_not(_bool01(x)) if _is_bool(x)
       else jnp.logical_not(_bool01(x)).astype(x.dtype), _NO_MINMAX_FC)

_FLOATY = FP_TYPES + FC_TYPES
_defun("SQRT", jnp.sqrt, _FLOATY)
_defun("LOG", jnp.log, _FLOATY)
_defun("EXP", jnp.exp, _FLOATY)
_defun("LOG2", jnp.log2, _FLOATY)
_defun("LOG10", jnp.log10, _FLOATY)
_defun("LOG1P", jnp.log1p, _FLOATY)
_defun("EXP2", jnp.exp2, _FLOATY)
_defun("EXPM1", jnp.expm1, _FLOATY)
_defun("SIN", jnp.sin, _FLOATY)
_defun("COS", jnp.cos, _FLOATY)
_defun("TAN", jnp.tan, _FLOATY)
_defun("ASIN", jnp.arcsin, _FLOATY)
_defun("ACOS", jnp.arccos, _FLOATY)
_defun("ATAN", jnp.arctan, _FLOATY)
_defun("SINH", jnp.sinh, _FLOATY)
_defun("COSH", jnp.cosh, _FLOATY)
_defun("TANH", jnp.tanh, _FLOATY)
_defun("ASINH", jnp.arcsinh, _FLOATY)
_defun("ACOSH", jnp.arccosh, _FLOATY)
_defun("ATANH", jnp.arctanh, _FLOATY)
_defun("SIGNUM", _signum, FP_TYPES)
_defun("CEIL", jnp.ceil, FP_TYPES)
_defun("FLOOR", jnp.floor, FP_TYPES)
_defun("ROUND", jnp.round, FP_TYPES)
_defun("TRUNC", jnp.trunc, FP_TYPES)
_defun("LGAMMA", jax.lax.lgamma, FP_TYPES)
def _tgamma(x):
    # lax.lgamma computes log|Gamma(x)| over the whole real line; restore
    # the sign via the reflection pattern: Gamma alternates sign on each
    # negative unit interval, negative exactly when floor(x) is odd.
    neg = jnp.mod(jnp.floor(x), 2.0) == 1.0
    sign = jnp.where(jnp.logical_and(x < 0, neg), -1.0, 1.0).astype(x.dtype)
    return sign * jnp.exp(jax.lax.lgamma(x))


_defun("TGAMMA", _tgamma, FP_TYPES)
_defun("ERF", jax.lax.erf, FP_TYPES)
_defun("ERFC", jax.lax.erfc, FP_TYPES)
_defun("FREXPX", _frexpx, FP_TYPES)
_defun("FREXPE", _frexpe, FP_TYPES)
_defun("ISINF", jnp.isinf, _FLOATY, "BOOL")
_defun("ISNAN", jnp.isnan, _FLOATY, "BOOL")
_defun("ISFINITE", jnp.isfinite, _FLOATY, "BOOL")
_defun("CONJ", jnp.conj, FC_TYPES)
_defun("CREAL", jnp.real, FC_TYPES, "REAL")
_defun("CIMAG", jnp.imag, FC_TYPES, "REAL")
_defun("CARG", lambda x: jnp.angle(x), FC_TYPES, "REAL")

UNARY_POSITIONAL = {
    "POSITIONI": ("i", 0),
    "POSITIONI1": ("i", 1),
    "POSITIONJ": ("j", 0),
    "POSITIONJ1": ("j", 1),
}
for _name in UNARY_POSITIONAL:
    UNARY[_name] = dict(
        fn=None, types=("INT32", "INT64"), ztype="T",
        positional=UNARY_POSITIONAL[_name],
    )


# ---------------------------------------------------------------------------
# Monoid table: op name -> (identity_fn(dtype), terminal_or_None, types)
# identity is a function of the jnp dtype so MIN/MAX/BAND can saturate.
# ---------------------------------------------------------------------------


def _id_zero(dt):
    return np.zeros((), dt)


def _id_one(dt):
    if dt == np.bool_:
        return np.bool_(True)
    return np.ones((), dt)


def _id_min(dt):
    # identity of MIN = +inf / int max
    if np.issubdtype(dt, np.floating):
        return np.array(np.inf, dt)
    return np.array(np.iinfo(dt).max, dt)


def _id_max(dt):
    if np.issubdtype(dt, np.floating):
        return np.array(-np.inf, dt)
    return np.array(np.iinfo(dt).min, dt)


def _id_true(dt):
    return np.bool_(True)


def _id_false(dt):
    return np.bool_(False)


def _id_allbits(dt):
    return np.array(-1, "int64").astype(dt)


MONOIDS = {
    # name: (binop name, identity fn, types)
    "MIN": ("MIN", _id_min, NONBOOL_REAL),
    "MAX": ("MAX", _id_max, NONBOOL_REAL),
    "PLUS": ("PLUS", _id_zero, NONBOOL_TYPES),
    "TIMES": ("TIMES", _id_one, NONBOOL_TYPES),
    "ANY": ("ANY", _id_zero, NONBOOL_TYPES),
    "BOR": ("BOR", _id_zero, UINT_TYPES),
    "BAND": ("BAND", _id_allbits, UINT_TYPES),
    "BXOR": ("BXOR", _id_zero, UINT_TYPES),
    "BXNOR": ("BXNOR", _id_allbits, UINT_TYPES),
}

BOOL_MONOIDS = {
    "LOR": ("LOR", _id_false),
    "LAND": ("LAND", _id_true),
    "LXOR": ("LXOR", _id_false),
    "LXNOR": ("LXNOR", _id_true),
    "EQ": ("LXNOR", _id_true),
    "ANY": ("ANY", _id_false),
}

# ---------------------------------------------------------------------------
# Semiring families (mirrors the reference's 5 regex families,
# semiring.py:87-121).  Each entry: (add monoids, mul ops, types).
# ---------------------------------------------------------------------------

SEMIRING_FAMILIES = [
    # non-boolean
    dict(
        adds=("MIN", "MAX", "PLUS", "TIMES", "ANY"),
        muls=(
            "FIRST", "FIRSTI", "FIRSTJ", "FIRSTI1", "FIRSTJ1",
            "SECOND", "SECONDI", "SECONDJ", "SECONDI1", "SECONDJ1",
            "MIN", "MAX", "PLUS", "MINUS", "RMINUS", "TIMES", "DIV", "RDIV",
            "ISEQ", "ISNE", "ISGT", "ISLT", "ISGE", "ISLE",
            "LOR", "LAND", "LXOR", "PAIR",
        ),
        types=NONBOOL_REAL,
        ztype="T",
    ),
    # boolean-producing comparators
    dict(
        adds=("LOR", "LAND", "LXOR", "EQ", "ANY"),
        muls=("EQ", "NE", "GT", "LT", "GE", "LE"),
        types=NONBOOL_REAL,
        ztype="BOOL",
    ),
    # pure boolean
    dict(
        adds=("LOR", "LAND", "LXOR", "EQ", "ANY"),
        muls=("FIRST", "SECOND", "LOR", "LAND", "LXOR", "EQ", "GT", "LT",
              "GE", "LE", "PAIR"),
        types=("BOOL",),
        ztype="T",
    ),
    # complex
    dict(
        adds=("PLUS", "TIMES", "ANY"),
        muls=("FIRST", "SECOND", "PLUS", "MINUS", "RMINUS", "TIMES", "DIV",
              "RDIV", "PAIR"),
        types=FC_TYPES,
        ztype="T",
    ),
    # bitwise
    dict(
        adds=("BOR", "BAND", "BXOR", "BXNOR"),
        muls=("BOR", "BAND", "BXOR", "BXNOR"),
        types=UINT_TYPES,
        ztype="T",
    ),
]
