"""pygraphblas_tpu: a TPU-native GraphBLAS framework.

A from-scratch implementation of the GraphBLAS sparse linear algebra API
(Matrix/Vector/Scalar containers, ~1,700 semirings, monoids, unary/binary/
select operators, masks, accumulators, descriptors) built on JAX/XLA/Pallas.
API parity target: Graphegon/pygraphblas (see SURVEY.md).

Unlike the reference — a CFFI binding over the SuiteSparse C library — all
compute here is JAX: dense bitmap kernels fused by XLA ride the MXU/VPU,
sparse kernels run over device index arrays, user-defined operators are
plain Python functions traced into kernels, and multi-chip scaling uses
``jax.sharding`` meshes (see ``pygraphblas_tpu.parallel``).

>>> from pygraphblas_tpu import Matrix, Vector, types
>>> A = Matrix.from_lists([0, 1, 2], [1, 2, 0], [1, 2, 3])
>>> print(A @ A)
      0  1  2
  0|        2|  0
  1|  6      |  1
  2|     3   |  2
      0  1  2
"""

import os as _os

# Persistent XLA compilation cache: kernel variants (bucketed SpGEMM
# widths, Benes passes, fused algorithm loops) compile in minutes
# through the remote-TPU tunnel but re-load in seconds.  Opt out by
# setting PYGB_XLA_CACHE=0 or configuring JAX_COMPILATION_CACHE_DIR
# yourself.  (Role analog: the reference's SuiteSparse pre-built
# kernel library, built once at install — build-wheels.sh:14.)
_cc = _os.environ.get("PYGB_XLA_CACHE", "/tmp/pygb_xla_cache")
if _cc != "0" and not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    import jax as _jax

    try:
        _jax.config.update("jax_compilation_cache_dir", _cc)
        # threshold 0: through the remote-TPU tunnel the real compile
        # happens SERVER-side and the local timer sees ~1s, so any
        # positive threshold refuses to cache exactly the executables
        # that cost minutes (a cached entry ships the compiled binary
        # and skips the remote compile entirely)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.0)
    except Exception:  # pragma: no cover - older jax without the flag
        pass

from .base import (
    NULL,
    GxB_INDEX_MAX,
    GxB_IMPLEMENTATION,
    GxB_SPEC,
    options_get,
    options_set,
    GraphBLASException,
    NoValue,
    UninitializedObject,
    InvalidObject,
    NullPointer,
    InvalidValue,
    InvalidIndex,
    DomainMismatch,
    DimensionMismatch,
    OutputNotEmpty,
    OutOfMemory,
    InsufficientSpace,
    IndexOutOfBound,
    Panic,
)

IMPLEMENTATION_MAJOR, IMPLEMENTATION_MINOR, IMPLEMENTATION_SUB = GxB_IMPLEMENTATION
IMPLEMENTATION_VERSION = GxB_IMPLEMENTATION

__version__ = "1.0.0"


def get_version():
    """Return the pygraphblas_tpu version."""
    return __version__


def init(blocking=False):
    """Library initialization (no-op: JAX initializes lazily; kept for
    API parity with the reference __init__.py:251)."""
    return None


__pdoc__ = {}

# Build the operator registries (the analog of the reference's reflection
# over the SuiteSparse symbol table, __init__.py:314-318).
from .semiring import build_semirings, current_semiring
from .binaryop import build_binaryops, Accum, binary_op, current_binop, current_accum
from .unaryop import build_unaryops, unary_op
from .selectop import build_selectops, select_op
from .monoid import build_monoids, current_monoid

build_binaryops(__pdoc__)
build_unaryops(__pdoc__)
build_monoids(__pdoc__)
build_semirings(__pdoc__)
build_selectops(__pdoc__)

from . import types
from . import descriptor
from . import selectop
from . import unaryop
from . import binaryop
from . import monoid
from . import semiring
from .matrix import Matrix
from .vector import Vector
from .scalar import Scalar

from .types import (
    BOOL,
    FP64,
    FP32,
    FC64,
    FC32,
    INT64,
    INT32,
    INT16,
    INT8,
    UINT64,
    UINT32,
    UINT16,
    UINT8,
    promote,
    binop,
    Type,
)

__all__ = [
    "GxB_INDEX_MAX",
    "GxB_IMPLEMENTATION",
    "GxB_SPEC",
    "Matrix",
    "Vector",
    "Scalar",
    "Accum",
    "BOOL",
    "FP64",
    "FP32",
    "FC64",
    "FC32",
    "INT64",
    "INT32",
    "INT16",
    "INT8",
    "UINT64",
    "UINT32",
    "UINT16",
    "UINT8",
    "descriptor",
    "selectop",
    "binary_op",
    "unary_op",
    "select_op",
    "options_set",
    "options_get",
    "types",
    "init",
]


def run_doctests(raise_on_error=False):
    """Execute every docstring example in the package (the reference's
    de-facto conformance suite, __init__.py:376-398)."""
    import sys
    import doctest

    from . import matrix as matrix_module
    from . import vector as vector_module
    from . import base as base_module
    from . import scalar as scalar_module
    from . import monoid as monoid_module
    from . import semiring as semiring_module
    from . import types as types_module
    from . import gviz as gviz_module
    from . import algorithms as algorithms_module

    this = sys.modules[__name__]
    failures = 0
    for mod in (
        this,
        selectop,
        unaryop,
        binaryop,
        matrix_module,
        vector_module,
        scalar_module,
        monoid_module,
        semiring_module,
        types_module,
        gviz_module,
        algorithms_module,
        descriptor,
        base_module,
    ):
        extraglobs = dict(
            Matrix=Matrix, Vector=Vector, Scalar=Scalar, types=types,
            descriptor=descriptor, GxB_INDEX_MAX=GxB_INDEX_MAX,
        )
        r = doctest.testmod(mod, optionflags=doctest.ELLIPSIS,
                            raise_on_error=raise_on_error,
                            extraglobs=extraglobs)
        failures += r.failed
    return failures
