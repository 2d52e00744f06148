"""Distributed execution over a device mesh.

`Matrix.shard(mesh)` block-partitions a graph over a
`jax.sharding.Mesh`; SpMV, PageRank, and triangle counting then run
under `shard_map` with XLA collectives (psum / all_gather over the ICI
on real TPU pods).  This demo uses an 8-device VIRTUAL cpu mesh — the
same code drives multi-chip TPU slices.

Run: python demo/07_distributed_mesh.py
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import networkx as nx  # noqa: E402

from pygraphblas_tpu import Matrix, types  # noqa: E402
from pygraphblas_tpu.parallel.dist import make_mesh  # noqa: E402

G = nx.gnm_random_graph(600, 5000, seed=5)
n = G.number_of_nodes()
rows, cols = [], []
for u, v in G.edges():
    rows += [u, v]
    cols += [v, u]
A = Matrix.sparse(types.FP32, n, n)
A._build(np.asarray(rows, np.int64), np.asarray(cols, np.int64),
         np.ones(len(rows), np.float32))

mesh = make_mesh(8)
print("mesh:", dict(mesh.shape), "devices:", len(jax.devices()))
D = A.shard(mesh)

r = D.pagerank(tol=1e-8)
print("distributed pagerank: sum(r) =", float(np.sum(r.to_numpy())))

tc = D.triangle_count()
want = sum(nx.triangles(G).values()) // 3
print(f"distributed triangle count: {tc} (networkx: {want})")
assert tc == want
print("OK")
