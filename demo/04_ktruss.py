"""K-Truss decomposition via iterated masked SpGEMM.

The k-truss of a graph is the maximal subgraph where every edge is
supported by >= k-2 triangles (reference `K-Truss.ipynb`): compute
per-edge support with C<A> = A @ A plus_pair, drop weak edges, repeat
until the edge set is stable.

Run: python demo/04_ktruss.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import networkx as nx  # noqa: E402

from pygraphblas_tpu import Matrix, types  # noqa: E402
from pygraphblas_tpu.algorithms import k_truss  # noqa: E402

G = nx.powerlaw_cluster_graph(800, 10, 0.5, seed=11)
n = G.number_of_nodes()
rows, cols = [], []
for u, v in G.edges():
    rows += [u, v]
    cols += [v, u]
A = Matrix.sparse(types.INT64, n, n)
A._build(np.asarray(rows, np.int64), np.asarray(cols, np.int64),
         np.ones(len(rows), np.int64))

for k in (3, 4, 5, 6):
    T = k_truss(A, k)
    want = nx.k_truss(G, k).number_of_edges() * 2
    print(f"{k}-truss: {T.nvals} directed edges (networkx: {want})")
    assert T.nvals == want
print("OK")
