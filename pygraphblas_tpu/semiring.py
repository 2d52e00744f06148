"""Semirings: an additive monoid paired with a multiplicative binary op.

All ~1,700 standard semirings are generated programmatically from the
family tables in ``ops/table.py`` (mirroring the reference's 5 reflection
families, ``pygraphblas/semiring.py:87-121``).  Each Semiring is a
lightweight pair (add monoid, mul op); kernels specialize one template per
(add, mul, dtype) at trace time.
"""

import sys
import contextvars

from . import types
from .ops import table
from . import monoid as monoid_module
from . import binaryop as binaryop_module

current_semiring = contextvars.ContextVar("current_semiring")

__all__ = ["Semiring", "current_semiring"]


class Semiring:
    """A GraphBLAS semiring."""

    __slots__ = ("name", "pls", "mul", "type", "type_cls", "add_monoid",
                 "mul_op", "_ztype_rule", "token")

    def __init__(self, pls, mul, typ, add=None, mul_op=None, ztype="T",
                 attach=True, type_cls=None):
        self.pls = pls
        self.mul = mul
        self.type = typ
        self.type_cls = type_cls if type_cls is not None else \
            getattr(types, typ, None)
        self.name = "_".join((pls, mul, typ))
        self.token = None
        self._ztype_rule = ztype
        if add is None:
            z = "BOOL" if ztype == "BOOL" else typ
            add = getattr(monoid_module, "_".join((pls, z, "monoid")))
        self.add_monoid = add
        if mul_op is None:
            mul_op = getattr(binaryop_module, "_".join((mul, typ)))
        self.mul_op = mul_op
        if attach:
            cls = getattr(types, typ, None)
            if cls is not None:
                nm = pls + "_" + mul
                setattr(cls, nm, self)
                setattr(cls, nm.lower(), self)

    def __repr__(self):
        return f"<Semiring {self.name}>"

    def __call__(self, A, B, *args, **kwargs):
        from .vector import Vector

        if isinstance(A, Vector):
            op = A.vxm
        elif isinstance(B, Vector):
            op = A.mxv
        else:
            op = A.mxm
        return op(B, self, *args, **kwargs)

    def __enter__(self):
        self.token = current_semiring.set(self)
        return self

    def __exit__(self, exception_type, exception_value, traceback):
        current_semiring.reset(self.token)
        return False

    def get_op(self):
        return self

    @property
    def ztype(self):
        """Result Type of this semiring (via the mul op's output domain)."""
        if self._ztype_rule == "BOOL":
            return types.BOOL
        return self.mul_op.ztype(self.type_cls)


def build_semirings(__pdoc__=None):
    this = sys.modules[__name__]
    for fam in table.SEMIRING_FAMILIES:
        for typ in fam["types"]:
            for pls in fam["adds"]:
                for mul in fam["muls"]:
                    # positional ops exist only as INT32/INT64-typed
                    # operators in SuiteSparse (5 adds x 8 positional
                    # muls x 2 types = 80 semirings); the reference's
                    # reflection regex (semiring.py:87-93) nominally
                    # admits more names, but `lib` exports none, so the
                    # registry parity target is SuiteSparse's documented
                    # 1,553 built-in semirings — asserted in
                    # tests/test_types.py::test_semiring_registry_count.
                    bin_name = "_".join((mul, typ))
                    if mul in ("FIRSTI", "FIRSTI1", "FIRSTJ", "FIRSTJ1",
                               "SECONDI", "SECONDI1", "SECONDJ", "SECONDJ1"):
                        if typ not in ("INT32", "INT64"):
                            continue
                        bin_name = "_".join((mul, typ))
                    if not hasattr(binaryop_module, bin_name):
                        continue
                    r = Semiring(pls, mul, typ, ztype=fam["ztype"])
                    setattr(this, r.name, r)
                    if __pdoc__ is not None:
                        __pdoc__[f"{typ}.{pls}_{mul}"] = f"Semiring {typ}.{pls}_{mul}"
