"""Single-source shortest paths: the MIN_PLUS semiring relaxation.

d = d min.+ A, iterated to fixpoint — the classic algebraic
Bellman-Ford (reference `SSSP.ipynb`).  Oracle: networkx dijkstra.

Run: python demo/08_sssp.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import networkx as nx  # noqa: E402

from pygraphblas_tpu import Matrix, types  # noqa: E402
from pygraphblas_tpu.algorithms import sssp  # noqa: E402

rng = np.random.RandomState(7)
G = nx.connected_watts_strogatz_graph(1500, 6, 0.4, seed=7)
n = G.number_of_nodes()
rows, cols, vals = [], [], []
for u, v in G.edges():
    w = float(rng.randint(1, 10))
    G[u][v]["weight"] = w
    rows += [u, v]
    cols += [v, u]
    vals += [w, w]
A = Matrix.sparse(types.FP64, n, n)
A._build(np.asarray(rows, np.int64), np.asarray(cols, np.int64),
         np.asarray(vals, np.float64))

d = sssp(A, 0)
got = dict(d)
want = nx.single_source_dijkstra_path_length(G, 0)
assert len(got) == len(want)
for node, dist in want.items():
    assert abs(got[node] - dist) < 1e-9, (node, got[node], dist)
print(f"sssp from 0: {len(got)} reachable, "
      f"max distance {max(got.values()):.0f} (networkx agrees)")
print("OK")
