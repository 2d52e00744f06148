"""Louvain community detection: modularity-gain local moves as
semiring SpGEMM (H = W @ M) plus community contraction (P^T W P).

Reference `Louvain.ipynb` validates the same algorithm against
python-louvain; here the oracle is networkx modularity on a planted
partition: the recovered partition must match the planted one.

Run: python demo/10_louvain.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import networkx as nx  # noqa: E402

from pygraphblas_tpu import Matrix, types  # noqa: E402
from pygraphblas_tpu.algorithms import louvain_cluster  # noqa: E402

G = nx.planted_partition_graph(5, 200, 0.10, 0.003, seed=3)
n = G.number_of_nodes()
rows, cols = [], []
for u, v in G.edges():
    rows += [u, v]
    cols += [v, u]
A = Matrix.sparse(types.FP32, n, n)
A._build(np.asarray(rows, np.int64), np.asarray(cols, np.int64),
         np.ones(len(rows), np.float32))

lab = louvain_cluster(A)
labels = np.zeros(n, np.int64)
for i, v in lab:
    labels[i] = v
ncomm = int(labels.max()) + 1
comms = [set(np.nonzero(labels == c)[0].tolist()) for c in range(ncomm)]
mod = nx.community.modularity(G, comms)
planted = [set(range(b * 200, (b + 1) * 200)) for b in range(5)]
mod_planted = nx.community.modularity(G, planted)

print(f"found {ncomm} communities, modularity {mod:.4f} "
      f"(planted partition: {mod_planted:.4f})")
assert mod >= mod_planted - 0.02, (mod, mod_planted)
print("OK")
