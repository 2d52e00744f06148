"""Runtime base: global options, error hierarchy, and the index-range
compiler.

TPU-native re-design of the runtime tier of pygraphblas (reference:
``pygraphblas/base.py``).  Instead of forwarding options to a C library,
options live in a Python-side :class:`GlobalConfig` that controls dispatch
behavior (format switching thresholds, debug "burble" logging, default
storage orientation) for the JAX/XLA execution engine.
"""

import ctypes
import os
import sys
import time
from dataclasses import dataclass, field

__all__ = [
    "NULL",
    "GraphBLASException",
    "NoValue",
    "UninitializedObject",
    "InvalidObject",
    "NullPointer",
    "InvalidValue",
    "InvalidIndex",
    "DomainMismatch",
    "DimensionMismatch",
    "OutputNotEmpty",
    "OutOfMemory",
    "InsufficientSpace",
    "IndexOutOfBound",
    "Panic",
    "options_set",
    "options_get",
    "perf_report",
    "profile_start",
    "profile_stop",
    "GxB_INDEX_MAX",
    "GxB_IMPLEMENTATION",
    "GxB_SPEC",
]

NULL = None

# Maximum logical dimension.  Like the reference (base.py:38) we allow huge
# logical index spaces; hypersparse storage keeps memory O(nnz).
GxB_INDEX_MAX = 2**60

# Implementation/spec version tuples for API parity.
GxB_IMPLEMENTATION = (1, 0, 0)
GxB_SPEC = (2, 0, 0)


def _tune_host_allocator():
    """Keep freed large blocks on the glibc heap (no mmap, no trim).

    On hypervisor-backed VMs, first-touch page faults can run two orders
    of magnitude slower than DRAM (measured ~10-20 MB/s vs 2.5 GB/s on
    the reference build host), and glibc munmaps every large free — so
    each big numpy temporary re-faults all of its pages.  Reusing heap
    pages makes temp-heavy host phases (SpMV plan builds, sorted-COO
    merges, graph generators) run at DRAM speed after warmup.  The cost
    is RSS staying at its high-water mark, which is the right trade for
    a compute host.  ``PYGB_MALLOC_TUNE=0`` disables.
    """
    if os.environ.get("PYGB_MALLOC_TUNE", "1") != "1":
        return
    if not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_MAX = -1, -4
        libc.mallopt(M_MMAP_MAX, 0)
        libc.mallopt(M_TRIM_THRESHOLD, 2**31 - 1)
    except Exception:  # pragma: no cover - musl/odd libc: feature is best-effort
        pass


_tune_host_allocator()


# --------------------------------------------------------------------------
# Error hierarchy (reference: base.py:133-210).  Same names, same meanings;
# raised by the dispatch layer on pre-trace validation.
# --------------------------------------------------------------------------


class GraphBLASException(Exception):
    pass


class NoValue(GraphBLASException):
    pass


class UninitializedObject(GraphBLASException):
    pass


class InvalidObject(GraphBLASException):
    pass


class NullPointer(GraphBLASException):
    pass


class InvalidValue(GraphBLASException):
    pass


class InvalidIndex(GraphBLASException):
    pass


class DomainMismatch(GraphBLASException):
    pass


class DimensionMismatch(GraphBLASException):
    pass


class OutputNotEmpty(GraphBLASException):
    pass


class OutOfMemory(GraphBLASException):
    pass


class InsufficientSpace(GraphBLASException):
    pass


class IndexOutOfBound(GraphBLASException):
    pass


class Panic(GraphBLASException):
    pass


# --------------------------------------------------------------------------
# Global configuration.
#
# The reference exposes nthreads/chunk/burble/hyper_switch/bitmap_switch/
# format globals (base.py:49-130).  On TPU, intra-op parallelism is XLA's
# job, so nthreads/chunk are retained for API parity but only influence
# kernel block sizing hints.  bitmap_switch/hyper_switch control the
# bitmap<->sparse format heuristics of the dispatch layer.
# --------------------------------------------------------------------------

BY_ROW = 0  # CSR-like orientation (GxB_BY_ROW)
BY_COL = 1  # CSC-like orientation (GxB_BY_COL)


@dataclass
class GlobalConfig:
    nthreads: int = 0  # 0 = let XLA decide; kept for parity
    chunk: float = 65536.0  # kernel work-chunk hint
    burble: int = 0  # dispatch debug logging switch
    hyper_switch: float = 0.0625  # rows present/nrows ratio to go hypersparse
    bitmap_switch: list = field(
        default_factory=lambda: [0.04, 0.05, 0.06, 0.08, 0.10, 0.20, 0.30, 0.40]
    )
    format: int = BY_ROW
    # per-op wall-clock counters (perf_report())
    op_timing: int = 0
    # TPU-specific knobs (no reference counterpart):
    # max number of logical cells a matrix may have and still be eligible
    # for the dense bitmap execution path.  2^26 fp32 cells = 256MB of
    # HBM — cheap on a 16GB chip, and it keeps MXU-friendly workloads
    # (e.g. the GraphChallenge DNN's 60000x1024 layers) on the dense
    # matmul path where they belong.
    bitmap_max_cells: int = 1 << 26
    # vectors have their own (much larger) dense budget: a 2^27 fp64
    # vector is 1GB of HBM, fine on-chip, and GAP-scale vertex sets
    # (twitter n=61.5M, urand n=2^26) must hold rank vectors on device
    vector_max_cells: int = 1 << 27
    # capacity growth factor for padded sparse index arrays
    capacity_factor: float = 1.25
    # SpMV kernel engine: "auto" picks the gather-free decode/permute/fold
    # pipeline (core/xspmv.py) when the semiring+size support it, falling
    # back to the slot-major csr8 plan; "csr8"/"xspmv" force one engine.
    spmv_engine: str = "auto"
    # Unmasked SpGEMM engine: "auto" picks compact densification onto the
    # MXU when the relabeled operands fit spgemm_dense_cells, then the
    # device expand/sort/compact pipeline (core/esc.py), then the host
    # two-phase fallback; "dense"/"esc"/"scipy" force one tier.
    spgemm_engine: str = "auto"
    spgemm_dense_cells: int = 1 << 24
    # When set, a cold xspmv plan is built in a background thread while
    # calls run a planless engine (COO/csr8) — first-touch latency at GAP
    # scale drops from minutes to seconds, and later calls upgrade to the
    # full-speed engine.  Off by default: the engine switch reorders the
    # floating-point reduction, so repeated calls are not bit-identical
    # while the build is in flight.
    spmv_plan_async: bool = False
    # Sparse (COO-tier) eWise/select engine: "auto" runs the sort-based
    # device pipeline (core/dewise.py) when the combined nnz reaches
    # ewise_device_min and the coordinates/dtypes qualify, else the host
    # single-pass merges (core/coosem.py); "device"/"host" force a tier.
    ewise_engine: str = "auto"
    ewise_device_min: int = 1 << 21


config = GlobalConfig()


def options_set(
    nthreads=None,
    chunk=None,
    burble=None,
    hyper_switch=None,
    bitmap_switch=None,
    format=None,
    op_timing=None,
    bitmap_max_cells=None,
    vector_max_cells=None,
    spmv_engine=None,
    spgemm_engine=None,
    spgemm_dense_cells=None,
    spmv_plan_async=None,
    ewise_engine=None,
    ewise_device_min=None,
):
    """Set global library options.

    Mirrors the reference option surface (``base.py:49``); options control
    the JAX dispatch layer rather than an external C runtime.

    - `nthreads`: parity knob; XLA manages intra-chip parallelism.
    - `chunk`: kernel work-chunk sizing hint.
    - `burble`: enable dispatch debug logging.
    - `hyper_switch`: hypersparsity switching threshold.
    - `bitmap_switch`: per-density thresholds for bitmap format switching.
    - `format`: default matrix orientation (BY_ROW or BY_COL).
    """
    if nthreads is not None:
        config.nthreads = int(nthreads)
    if chunk is not None:
        config.chunk = float(chunk)
    if burble is not None:
        config.burble = int(burble)
    if hyper_switch is not None:
        config.hyper_switch = float(hyper_switch)
    if bitmap_switch is not None:
        config.bitmap_switch = list(bitmap_switch)
    if format is not None:
        config.format = int(format)
    if op_timing is not None:
        config.op_timing = int(op_timing)
    if bitmap_max_cells is not None:
        config.bitmap_max_cells = int(bitmap_max_cells)
    if vector_max_cells is not None:
        config.vector_max_cells = int(vector_max_cells)
    if spmv_engine is not None:
        if spmv_engine not in ("auto", "csr8", "xspmv"):
            raise ValueError("spmv_engine must be auto|csr8|xspmv")
        config.spmv_engine = spmv_engine
    if spgemm_engine is not None:
        if spgemm_engine not in ("auto", "dense", "esc", "scipy"):
            raise ValueError("spgemm_engine must be auto|dense|esc|scipy")
        config.spgemm_engine = spgemm_engine
    if spgemm_dense_cells is not None:
        config.spgemm_dense_cells = int(spgemm_dense_cells)
    if spmv_plan_async is not None:
        config.spmv_plan_async = bool(spmv_plan_async)
    if ewise_engine is not None:
        if ewise_engine not in ("auto", "device", "host"):
            raise ValueError("ewise_engine must be auto|device|host")
        config.ewise_engine = ewise_engine
    if ewise_device_min is not None:
        config.ewise_device_min = int(ewise_device_min)


def options_get():
    """Get global library options.

    >>> from pprint import pprint
    >>> pprint(options_get())
    {'bitmap_switch': [...],
     'burble': ...,
     'chunk': ...,
     'format': ...,
     'hyper_switch': ...,
     'nthreads': ...}
    """
    return dict(
        nthreads=config.nthreads,
        chunk=config.chunk,
        burble=config.burble,
        hyper_switch=config.hyper_switch,
        bitmap_switch=list(config.bitmap_switch),
        format=config.format,
    )


def burble(msg, *args):
    """Dispatch-layer debug logging, the TPU analog of SuiteSparse burble."""
    if config.burble:
        print("[burble %.6f] %s" % (time.time(), msg % args), file=sys.stderr)


# --------------------------------------------------------------------------
# Observability: per-operation wall-clock counters + jax profiler hooks
# (SURVEY §5: "jax profiler traces + per-kernel cost logging").
# --------------------------------------------------------------------------

perf_counters = {}


def _timed(name):
    """Decorate a dispatch-layer operation with an op-timing counter
    (enabled via ``options_set(op_timing=1)``; ~zero cost when off)."""
    from functools import wraps

    def deco(fn):
        @wraps(fn)
        def wrap(*a, **k):
            if not config.op_timing:
                return fn(*a, **k)
            t0 = time.perf_counter()
            try:
                return fn(*a, **k)
            finally:
                c = perf_counters.setdefault(name, [0, 0.0])
                c[0] += 1
                c[1] += time.perf_counter() - t0
        return wrap
    return deco


def perf_report(reset=False, file=None):
    """Aggregated per-op timing: {op: (calls, total_seconds)}.  With
    file= (e.g. sys.stderr) also prints a sorted table."""
    snap = {k: tuple(v) for k, v in perf_counters.items()}
    if file is not None:
        for k, (n, t) in sorted(snap.items(), key=lambda kv: -kv[1][1]):
            print(f"{k:24s} {n:8d} calls {t:10.4f} s", file=file)
    if reset:
        perf_counters.clear()
    return snap


def profile_start(log_dir):
    """Start a jax profiler trace (TensorBoard format); per-kernel
    device timings land in `log_dir`."""
    import jax

    jax.profiler.start_trace(log_dir)


def profile_stop():
    import jax

    jax.profiler.stop_trace()


# --------------------------------------------------------------------------
# Index-range compiler (reference semantics: base.py:216-250).
#
# GraphBLAS slices are *stop-inclusive*.  ``_build_range`` compiles a Python
# slice / list / None into an IndexSet carrying (kind, params, size) that the
# gather/scatter kernels consume.  Sizes are resolved against the dimension
# at dispatch time so kernels always see static shapes.
# --------------------------------------------------------------------------

_all_slice = slice(None, None, None)


class IndexSet:
    """Compiled index descriptor: one of ALL, LIST, RANGE, STRIDE, BACKWARDS."""

    __slots__ = ("kind", "start", "stop", "step", "list", "size")

    ALL = "all"
    LIST = "list"
    RANGE = "range"
    STRIDE = "stride"
    BACKWARDS = "backwards"

    def __init__(self, kind, start=None, stop=None, step=None, list_=None, size=None):
        self.kind = kind
        self.start = start
        self.stop = stop
        self.step = step
        self.list = list_
        self.size = size

    def indices(self, dim_size):
        """Materialize as a host index vector against a dimension size."""
        import numpy as np

        if self.kind == IndexSet.ALL:
            return np.arange(dim_size, dtype=np.int64)
        if self.kind == IndexSet.LIST:
            return np.asarray(self.list, dtype=np.int64)
        if self.kind == IndexSet.RANGE:
            return np.arange(self.start, self.stop + 1, dtype=np.int64)
        if self.kind == IndexSet.STRIDE:
            return np.arange(self.start, self.stop + 1, self.step,
                             dtype=np.int64)
        if self.kind == IndexSet.BACKWARDS:
            return np.arange(self.start, self.stop - 1, -self.step,
                             dtype=np.int64)
        raise Panic("unknown index kind")  # pragma: no cover


def _build_range(rslice, stop_val):
    """Compile a Python slice/list into an :class:`IndexSet`.

    Follows GraphBLAS stop-INCLUSIVE slice semantics exactly as the
    reference does (base.py:216-250): ``A[1:3]`` selects rows 1,2,3.
    """
    if isinstance(rslice, list):
        return IndexSet(IndexSet.LIST, list_=rslice, size=len(rslice))

    if rslice is None or rslice == _all_slice:
        return IndexSet(IndexSet.ALL, size=None)

    start = rslice.start
    stop = rslice.stop
    step = rslice.step
    if start is None:
        start = 0
    if stop is None:
        stop = stop_val
    if step is None:
        size = (stop - start) + 1
        return IndexSet(IndexSet.RANGE, start=start, stop=stop, size=size)
    elif step < 0:
        step = abs(step)
        if start < stop:
            size = 0
        else:
            size = int((start - stop) / step) + 1
        return IndexSet(IndexSet.BACKWARDS, start=start, stop=stop, step=step, size=size)
    else:
        if start > stop or step == 0:
            size = 0
        else:
            size = int((stop - start) / step) + 1
        return IndexSet(IndexSet.STRIDE, start=start, stop=stop, step=step, size=size)


_SELECT_OP_NAMES = {
    ">": "GT_THUNK",
    "<": "LT_THUNK",
    ">=": "GE_THUNK",
    "<=": "LE_THUNK",
    "!=": "NE_THUNK",
    "==": "EQ_THUNK",
    ">0": "GT_ZERO",
    "<0": "LT_ZERO",
    ">=0": "GE_ZERO",
    "<=0": "LE_ZERO",
    "!=0": "NONZERO",
    "==0": "EQ_ZERO",
}


def _get_select_op(op):
    from . import selectop as selectop_module

    return getattr(selectop_module, _SELECT_OP_NAMES[op])


def _get_bin_op(op, funcs):
    return {
        ">": funcs.GT,
        "<": funcs.LT,
        ">=": funcs.GE,
        "<=": funcs.LE,
        "!=": funcs.NE,
        "==": funcs.EQ,
        "+": funcs.PLUS,
        "-": funcs.MINUS,
        "*": funcs.TIMES,
        "/": funcs.DIV,
    }[op]
