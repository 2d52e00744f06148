"""Triangle counting: masked SpGEMM in three formulations.

total = sum over edges of |N(u) ∩ N(v)| computed as C<L> = L @ L with
the plus_pair semiring (reference `TriangleCentrality.ipynb` and the
GraphChallenge formulation; BASELINE config[2]).

Run: python demo/03_triangle_counting.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import networkx as nx  # noqa: E402

from pygraphblas_tpu import Matrix, types  # noqa: E402
from pygraphblas_tpu.algorithms import triangle_count  # noqa: E402

G = nx.powerlaw_cluster_graph(2000, 8, 0.3, seed=4)
n = G.number_of_nodes()
rows, cols = [], []
for u, v in G.edges():
    rows += [u, v]
    cols += [v, u]
A = Matrix.sparse(types.BOOL, n, n)
A._build(np.asarray(rows, np.int64), np.asarray(cols, np.int64),
         np.ones(len(rows), np.bool_))

want = sum(nx.triangles(G).values()) // 3
for method in ("sandia", "cohen", "sandia_dot"):
    got = triangle_count(A, method)
    print(f"{method:11s}: {got} triangles")
    assert got == want, (got, want)
print(f"networkx   : {want} triangles")
print("OK")
