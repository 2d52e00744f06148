"""Block-partitioned distributed semiring SpMV over a device mesh.

The scaling tier (no reference counterpart — SURVEY §2.3): an adjacency
matrix is 2-D block-partitioned over a ``Mesh`` with axes ("i", "j");
each device owns one (row-block, col-block) tile as padded COO index
arrays.  A semiring SpMV is then

    y_i = (+)_j  A_ij (*) x_j

computed as a local gather + segment-reduce per tile under ``shard_map``,
followed by a ``psum`` over the "j" axis (ICI all-reduce).  Vector
resharding between iterations (P('i') results -> P('j') operands) is left
to the XLA partitioner via sharding constraints, which lowers to an
all-gather/slice over ICI — the frontier/halo exchange of the design
brief.

Everything is static-shaped: tiles are padded to the max per-tile nnz, so
one compiled executable serves every iteration.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

_MULS = {
    "TIMES": lambda a, x: a * x,
    "SECOND": lambda a, x: x,
    "FIRST": lambda a, x: a,
    "PAIR": lambda a, x: jnp.ones_like(x),
}

_ADDS = {
    "PLUS": jax.ops.segment_sum,
    "MIN": jax.ops.segment_min,
    "MAX": jax.ops.segment_max,
}


def make_mesh(n_devices=None, axis_names=("i", "j")):
    """Create a 2-D device mesh (as square as possible)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    pi = 1
    for f in range(int(np.sqrt(n_devices)), 0, -1):
        if n_devices % f == 0:
            pi = f
            break
    pj = n_devices // pi
    return Mesh(np.array(devs).reshape(pi, pj), axis_names)


def _cdiv(a, b):
    return -(-a // b)


class DistSpMV:
    """2-D block-partitioned semiring SpMV executor.

    Parameters
    ----------
    mesh : Mesh with axes ("i", "j")
    nrows, ncols : global logical dimensions
    rows, cols, vals : host COO triples (numpy)
    add, mul : builtin monoid / binary op names (static)
    """

    def __init__(self, mesh, nrows, ncols, rows, cols, vals,
                 add="PLUS", mul="TIMES", dtype=np.float32):
        self.mesh = mesh
        self.add = add
        self.mul = mul
        pi, pj = (mesh.shape["i"], mesh.shape["j"])
        self.pi, self.pj = pi, pj
        self.rb = _cdiv(nrows, pi)
        self.cb = _cdiv(ncols, pj)
        self.nrows_p = self.rb * pi
        self.ncols_p = self.cb * pj
        self.dtype = np.dtype(dtype)

        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        vals = np.asarray(vals, self.dtype)

        bi = rows // self.rb
        bj = cols // self.cb
        counts = np.zeros((pi, pj), np.int64)
        np.add.at(counts, (bi, bj), 1)
        E = max(int(counts.max()), 1)
        self.tile_nnz = E

        rows_l = np.full((pi, pj, E), self.rb, np.int32)  # sentinel = rb
        cols_l = np.zeros((pi, pj, E), np.int32)
        vals_l = np.zeros((pi, pj, E), self.dtype)
        fill = np.zeros((pi, pj), np.int64)
        order = np.lexsort((bj, bi))
        for e in order:
            i, j = bi[e], bj[e]
            k = fill[i, j]
            rows_l[i, j, k] = rows[e] - i * self.rb
            cols_l[i, j, k] = cols[e] - j * self.cb
            vals_l[i, j, k] = vals[e]
            fill[i, j] = k + 1

        tile_spec = NamedSharding(mesh, P("i", "j", None))
        self.rows_l = jax.device_put(rows_l, tile_spec)
        self.cols_l = jax.device_put(cols_l, tile_spec)
        self.vals_l = jax.device_put(vals_l, tile_spec)
        self.x_spec = NamedSharding(mesh, P("j"))
        self.y_spec = NamedSharding(mesh, P("i"))
        self._fn = self._build()

    def _build(self):
        add = _ADDS[self.add]
        mul = _MULS[self.mul]
        rb = self.rb

        def tile_spmv(rows_l, cols_l, vals_l, x):
            # local tile: gather + mul + segment-reduce, then combine over j
            rows_t = rows_l[0, 0]
            cols_t = cols_l[0, 0]
            vals_t = vals_l[0, 0]
            xg = x[cols_t]
            prod = mul(vals_t, xg)
            y = add(prod, rows_t, num_segments=rb + 1)[:rb]
            if self.add == "PLUS":
                return jax.lax.psum(y, "j")
            if self.add == "MIN":
                return jax.lax.pmin(y, "j")
            return jax.lax.pmax(y, "j")

        shmap = jax.shard_map(
            tile_spmv,
            mesh=self.mesh,
            in_specs=(P("i", "j", None), P("i", "j", None),
                      P("i", "j", None), P("j")),
            out_specs=P("i"),
        )

        def spmv(x):
            # x arrives sharded P('i') from the previous iteration (or
            # replicated); constrain to P('j') so XLA inserts the halo
            # exchange (all-gather over ICI) ahead of the local compute.
            x = jax.lax.with_sharding_constraint(x, self.x_spec)
            y = shmap(self.rows_l, self.cols_l, self.vals_l, x)
            return jax.lax.with_sharding_constraint(y, self.y_spec)

        return spmv

    def __call__(self, x):
        return self._fn(x)


def dist_pagerank_step(spmv, r, d_inv_damped, teleport):
    """One distributed PageRank iteration.

    r, d_inv_damped are P('i')-sharded dense vectors of size nrows_p;
    `spmv` must be built on the TRANSPOSED adjacency with mul="SECOND".
    Returns (new ranks, L1 residual).
    """
    w = r * d_inv_damped
    contrib = spmv(w)
    r_new = teleport + contrib
    rdiff = jnp.sum(jnp.abs(r_new - r))
    return r_new, rdiff


def dist_pagerank(mesh, nrows, rows, cols, damping=0.85, itermax=100,
                  tol=1e-4, dtype=np.float32):
    """End-to-end distributed PageRank over the mesh (GAP formulation,
    matching ``algorithms.pagerank``)."""
    deg = np.zeros(nrows, dtype)
    np.add.at(deg, np.asarray(rows, np.int64), 1)
    # pad the square dimension so both mesh axes divide it evenly (the
    # rank vector is alternately sharded P('i') and P('j'))
    pi, pj = mesh.shape["i"], mesh.shape["j"]
    N = _cdiv(nrows, pi * pj) * pi * pj
    spmv = DistSpMV(mesh, N, N, cols, rows,  # transposed
                    np.ones(len(rows), dtype), add="PLUS", mul="SECOND",
                    dtype=dtype)
    n_p = spmv.nrows_p
    deg_p = np.zeros(n_p, dtype)
    deg_p[:nrows] = deg
    with np.errstate(divide="ignore"):
        d_inv = np.where(deg_p > 0, damping / np.maximum(deg_p, 1), 0.0)
    d_inv = jax.device_put(d_inv.astype(dtype), spmv.y_spec)
    r = jax.device_put(np.full(n_p, 1.0 / nrows, dtype), spmv.y_spec)
    teleport = np.asarray((1.0 - damping) / nrows, dtype)

    step = jax.jit(partial(dist_pagerank_step, spmv))
    for _ in range(itermax):
        r, rdiff = step(r, d_inv, teleport)
        if float(rdiff) <= tol:
            break
    return np.asarray(r)[:nrows]
