"""Fused whole-algorithm kernels: one jit-compiled XLA program per
algorithm, with the iteration loop as ``lax.while_loop`` on device.

The eager container API dispatches one compiled kernel per GraphBLAS
call — convenient, but each dispatch pays host->device latency and
prevents cross-op fusion.  For the iterative workloads (PageRank, BFS,
SSSP) this module compiles the ENTIRE loop into a single executable over
the matrix's cached ELL arrays: zero per-iteration dispatches, XLA
fusion across the update expressions, and convergence checks staying on
device.  This is the TPU-native "production path"; results match the
eager `algorithms` implementations.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .vector import Vector
from . import types

__all__ = ["pagerank", "bfs_level", "sssp"]


def _ell_arrays(A, transpose):
    ell = A._ell(transpose)
    return (tuple(ell.cols), tuple(ell.vals), tuple(ell.valid_counts),
            ell.vrow_rows, tuple(ell.widths))


def _spmv_plus_second(cols_list, vals_list, cnt_list, vrow_rows, widths,
                      out_size, x):
    """y = A (+.second) x with x dense: y[i] = sum_j:A[i,j] x[j]."""
    parts = []
    for cm, vm, cnt in zip(cols_list, vals_list, cnt_list):
        lane = jax.lax.broadcasted_iota(jnp.int32, cm.shape, 1)
        valid = lane < cnt[:, None]
        xg = x[cm]
        parts.append(jnp.sum(jnp.where(valid, xg, 0.0), axis=1))
    all_parts = jnp.concatenate(parts) if parts else jnp.zeros((0,), x.dtype)
    return jax.ops.segment_sum(all_parts, vrow_rows, out_size)


def _spmv_lor_second_bool(cols_list, cnt_list, vrow_rows, widths, out_size,
                          frontier):
    """y = A (lor.second) frontier over booleans."""
    parts = []
    for cm, cnt in zip(cols_list, cnt_list):
        lane = jax.lax.broadcasted_iota(jnp.int32, cm.shape, 1)
        valid = lane < cnt[:, None]
        fg = frontier[cm]
        parts.append(jnp.any(jnp.logical_and(valid, fg), axis=1))
    all_parts = (jnp.concatenate(parts) if parts
                 else jnp.zeros((0,), jnp.bool_))
    return jax.ops.segment_max(all_parts.astype(jnp.int8), vrow_rows,
                               out_size) > 0


def _spmv_min_plus(cols_list, vals_list, cnt_list, vrow_rows, widths,
                   out_size, x):
    """y = A (min.+) x with x dense (inf = absent)."""
    inf = jnp.asarray(np.inf, x.dtype)
    parts = []
    for cm, vm, cnt in zip(cols_list, vals_list, cnt_list):
        lane = jax.lax.broadcasted_iota(jnp.int32, cm.shape, 1)
        valid = lane < cnt[:, None]
        xg = x[cm]
        parts.append(jnp.min(jnp.where(valid, vm + xg, inf), axis=1))
    all_parts = jnp.concatenate(parts) if parts else jnp.zeros((0,), x.dtype)
    return jax.ops.segment_min(all_parts, vrow_rows, out_size)


@partial(jax.jit, static_argnames=("widths", "n", "itermax"))
def _pagerank_loop(cols_list, vals_list, cnt_list, vrow_rows, widths,
                   n, itermax, d_inv_damped, teleport, tol):
    r0 = jnp.full((n,), 1.0 / n, jnp.float32)

    def cond(carry):
        r, rdiff, i = carry
        return jnp.logical_and(rdiff > tol, i < itermax)

    def body(carry):
        r, _, i = carry
        w = r * d_inv_damped
        # SpMV on the transposed graph (built transposed by the caller)
        contrib = _spmv_plus_second(cols_list, vals_list, cnt_list,
                                    vrow_rows, widths, n, w)
        r_new = teleport + contrib
        rdiff = jnp.sum(jnp.abs(r_new - r))
        return r_new, rdiff, i + 1

    r, rdiff, iters = jax.lax.while_loop(cond, body,
                                         (r0, jnp.float32(np.inf),
                                          jnp.int32(0)))
    return r, rdiff, iters


def pagerank(A, damping=0.85, itermax=100, tol=1e-4):
    """Whole-loop-fused PageRank; returns a dense FP32 Vector.

    Single compiled executable: per-iteration cost is pure kernel time.
    """
    n = A.nrows
    cols_list, vals_list, cnt_list, vrow_rows, widths = _ell_arrays(A, True)
    # out-degree on device from the non-transposed ELL counts
    r_dev, c_dev, _ = A._device_coo()
    deg = jax.ops.segment_sum(jnp.ones(r_dev.shape, jnp.float32), r_dev, n)
    d_inv = jnp.where(deg > 0, damping / jnp.maximum(deg, 1.0), 0.0)
    r, rdiff, iters = _pagerank_loop(
        cols_list, vals_list, cnt_list, vrow_rows, widths, n, itermax,
        d_inv.astype(jnp.float32), jnp.float32((1 - damping) / n),
        jnp.float32(tol))
    out = Vector.sparse(types.FP32, n)
    out._set_dense(r, jnp.ones((n,), jnp.bool_))
    return out


@partial(jax.jit, static_argnames=("widths", "n"))
def _bfs_loop(cols_list, cnt_list, vrow_rows, widths, n, start):
    levels = jnp.zeros((n,), jnp.int64)
    frontier = jnp.zeros((n,), jnp.bool_).at[start].set(True)

    def cond(carry):
        levels, frontier, level = carry
        return jnp.logical_and(jnp.any(frontier), level <= n)

    def body(carry):
        levels, frontier, level = carry
        levels = jnp.where(frontier, level, levels)
        nxt = _spmv_lor_second_bool(cols_list, cnt_list, vrow_rows, widths,
                                    n, frontier)
        nxt = jnp.logical_and(nxt, levels == 0)  # unvisited only
        return levels, nxt, level + 1

    levels, _, _ = jax.lax.while_loop(cond, body,
                                      (levels, frontier, jnp.int64(1)))
    return levels


def bfs_level(A, start):
    """Whole-loop-fused level-synchronous BFS (vxm = transposed-ELL SpMV);
    returns an INT64 Vector of 1-based levels (sparse: unreached absent).
    """
    n = A.nrows
    cols_list, _, cnt_list, vrow_rows, widths = _ell_arrays(A, True)
    levels = _bfs_loop(cols_list, cnt_list, vrow_rows, widths, n,
                       jnp.int32(start))
    out = Vector.sparse(types.INT64, n)
    out._set_dense(levels, levels > 0)
    return out


@partial(jax.jit, static_argnames=("widths", "n"))
def _sssp_loop(cols_list, vals_list, cnt_list, vrow_rows, widths, n, start):
    inf = jnp.asarray(np.inf, vals_list[0].dtype if vals_list
                      else jnp.float64)
    dist = jnp.full((n,), inf).at[start].set(0.0)

    def cond(carry):
        dist, changed, i = carry
        return jnp.logical_and(changed, i < n)

    def body(carry):
        dist, _, i = carry
        relax = _spmv_min_plus(cols_list, vals_list, cnt_list, vrow_rows,
                               widths, n, dist)
        new = jnp.minimum(dist, relax)
        return new, jnp.any(new < dist), i + 1

    dist, _, _ = jax.lax.while_loop(cond, body, (dist, True, jnp.int32(0)))
    return dist


def sssp(A, start):
    """Whole-loop-fused Bellman-Ford SSSP (min_plus); returns a Vector of
    distances (unreachable absent)."""
    n = A.nrows
    cols_list, vals_list, cnt_list, vrow_rows, widths = _ell_arrays(A, True)
    dist = _sssp_loop(cols_list, vals_list, cnt_list, vrow_rows, widths, n,
                      jnp.int32(start))
    out = Vector.sparse(A.type, n)
    out._set_dense(dist.astype(A.type._jnp_dtype()), jnp.isfinite(dist))
    return out
