"""PageRank on a random graph, three ways.

- `algorithms.pagerank`: the GAP formulation (masked transposed
  plus_second SpMV, reference gap/prmark.py)
- `fused.pagerank`: the whole iteration loop compiled into ONE XLA
  executable (TPU deployment shape: zero per-iteration dispatch)
- networkx as the oracle

Run: python demo/02_pagerank.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import networkx as nx  # noqa: E402

from pygraphblas_tpu import Matrix, types  # noqa: E402
from pygraphblas_tpu.algorithms import pagerank  # noqa: E402

G = nx.gnm_random_graph(500, 4000, seed=2, directed=True)
A = Matrix.sparse(types.FP32, 500, 500)
rows = np.asarray([u for u, v in G.edges()], np.int64)
cols = np.asarray([v for u, v in G.edges()], np.int64)
A._build(rows, cols, np.ones(len(rows), np.float32))

r = pagerank(A, damping=0.85, tol=1e-8)
got = r.to_numpy()
expect = nx.pagerank(G, alpha=0.85, tol=1e-10, weight=None)
err = max(abs(got[nd] - val) for nd, val in expect.items())
print(f"pagerank: n=500 max|err| vs networkx = {err:.2e}")
assert err < 1e-3

top = np.argsort(got)[::-1][:5]
print("top-5 vertices:", top.tolist())
print("OK")
