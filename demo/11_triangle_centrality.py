"""Triangle centrality (Burkhardt): rank vertices by the triangles in
their neighborhood, computed with masked plus_pair SpGEMM + two SpMVs.

TC(v) = (3*A@y - 2*That@y + y) / k  where y = per-vertex triangle
counts (reference `TriangleCentrality.ipynb`).  Oracle: brute-force
numpy triangle enumeration.

Run: python demo/11_triangle_centrality.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import networkx as nx  # noqa: E402

from pygraphblas_tpu import Matrix, types  # noqa: E402
from pygraphblas_tpu.algorithms import triangle_centrality  # noqa: E402

G = nx.powerlaw_cluster_graph(800, 6, 0.3, seed=9)
n = G.number_of_nodes()
rows, cols = [], []
for u, v in G.edges():
    rows += [u, v]
    cols += [v, u]
A = Matrix.sparse(types.FP64, n, n)
A._build(np.asarray(rows, np.int64), np.asarray(cols, np.int64),
         np.ones(len(rows), np.float64))

tc = triangle_centrality(A)
got = np.zeros(n)
for i, v in tc:
    got[i] = v

# brute-force oracle (Burkhardt: y = triangle-edge row sums)
Ad = np.zeros((n, n))
Ad[np.asarray(rows), np.asarray(cols)] = 1.0
T = (Ad @ Ad) * Ad                      # common neighbors per edge
y = T.sum(axis=1)                       # 2x triangles at each vertex
k = y.sum()
That = (T != 0).astype(float)           # triangle-edge pattern
want = (3.0 * Ad @ y - 2.0 * That @ y + y) / k if k else y

err = np.max(np.abs(got - want))
assert err < 1e-8, err
top = np.argsort(-got)[:5]
print("top-5 by triangle centrality:", top.tolist())
print(f"max abs error vs brute force: {err:.2e}")
print("OK")
