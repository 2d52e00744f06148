"""Binary operators.

BinaryOp objects pair a name with a JAX-traceable scalar function and a
result-type rule.  Built-ins are generated from the semantic table in
``ops/table.py`` (reference surface: ``pygraphblas/binaryop.py``); user
ops are created with the :func:`binary_op` decorator from a plain Python
function — JAX traces it straight into the kernels, the TPU-native
equivalent of the reference's numba-cfunc registration
(binaryop.py:137-191).
"""

__all__ = [
    "BinaryOp",
    "Accum",
    "current_binop",
    "current_accum",
    "binary_op",
]

import sys
import contextvars

from . import types
from .ops import table

current_accum = contextvars.ContextVar("current_accum")
current_binop = contextvars.ContextVar("current_binop")


class BinaryOp:
    """A GraphBLAS binary operator z = f(x, y).

    Also a context manager: ``with op:`` sets the default operator for
    `eadd`/`emult` and the ``+``/``*`` overloads inside the block.
    """

    def __init__(self, op, typ, fn=None, ztype="T", positional=None,
                 boolean=False, udt=None, attach=True, builtin=False):
        self.op = op
        self.type_name = typ
        self.fn = fn
        self.builtin = builtin
        self.ztype_rule = "BOOL" if boolean else ztype
        self.positional = positional
        self.udt = udt
        self.name = "_".join((op, typ))
        self.__doc__ = self.name
        self.token = None
        if attach and udt is None:
            cls = getattr(types, typ, None)
            if cls is not None:
                setattr(cls, op, self)
                setattr(cls, op.lower(), self)

    def __repr__(self):
        return f"<BinaryOp {self.name}>"

    def __enter__(self):
        self.token = current_binop.set(self)
        return self

    def __exit__(self, *errors):
        current_binop.reset(self.token)
        return False

    def __call__(self, A, B, *args, **kwargs):
        return A.emult(B, self, *args, **kwargs)

    def get_op(self):
        return self

    def ztype(self, input_type):
        """Result Type given the operand Type."""
        if self.ztype_rule == "BOOL":
            return types.BOOL
        if self.ztype_rule == "CMPLX":
            return types.FC32 if input_type == types.FP32 else types.FC64
        if self.positional is not None:
            return getattr(types, self.type_name)
        return input_type

    def apply(self, x, y, pos=None):
        """Trace the scalar semantics over jnp arrays.

        Struct-UDT ops receive/return dicts of member arrays; array
        arguments arriving as numpy structured arrays are converted at
        this boundary (struct-of-arrays on device)."""
        if self.positional is not None:
            key, off = self.positional
            return pos[key] + off
        if self.udt is not None and getattr(self.udt, "member_def", None):
            import numpy as _np

            def as_dict(a):
                if isinstance(a, dict):
                    return a
                a = _np.asarray(a)
                if a.dtype.names:
                    return self.udt.to_dict(a)
                return a

            xd, yd = as_dict(x), as_dict(y)
            zd = self.fn(xd, yd)
            if isinstance(zd, dict) and not isinstance(x, dict):
                return self.udt.from_dict(zd)
            return zd
        return self.fn(x, y)


class Accum:
    """Context manager to set the default accumulator for overloaded
    operator contexts like ``@=``.  See `Matrix.mxm`."""

    __slots__ = ("binaryop", "token")

    def __init__(self, binaryop):
        self.binaryop = binaryop

    def __enter__(self):
        self.token = current_accum.set(self.binaryop)
        return self

    def __exit__(self, *errors):
        current_accum.reset(self.token)
        return False


def build_binaryops(__pdoc__=None):
    """Instantiate every built-in BinaryOp and attach to type classes and
    this module (e.g. ``binaryop.PLUS_INT64`` and ``INT64.PLUS``)."""
    this = sys.modules[__name__]
    for op_name, spec in table.BINARY.items():
        for typ in spec["types"]:
            r = BinaryOp(
                op_name,
                typ,
                fn=spec["fn"],
                ztype=spec["ztype"],
                positional=spec["positional"],
                builtin=True,
            )
            setattr(this, r.name, r)
            if r.name not in __all__:
                __all__.append(r.name)
            if __pdoc__ is not None:
                __pdoc__[f"{typ}.{op_name}"] = f"BinaryOp {typ}.{op_name}"


def binary_op(arg_type, nopython=True, boolean=False):
    """Decorator turning a Python function into a BinaryOp.

    The function is traced by JAX inside the kernels — no C pointer
    registration needed.

    >>> from pygraphblas_tpu import Matrix, binary_op, types
    >>> @binary_op(types.FP64)
    ... def plus3(x, y):
    ...     return x + y + 3
    >>> A = Matrix.from_lists([0, 1], [1, 0], [1.0, 2.0])
    >>> print(A.emult(A, plus3))
          0  1
      0|   5.0|  0
      1|7.0   |  1
          0  1
    """

    def inner(func):
        return BinaryOp(
            func.__name__, arg_type.__name__, fn=func, boolean=boolean, attach=False
        )

    return inner
