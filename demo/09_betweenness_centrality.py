"""Batched betweenness centrality: masked PLUS_FIRST SpMM sweeps.

Brandes forward/backward over a batch of sources held as rows of one
matrix (reference `gap/bcmark.py:16-67`, `BetweennessCentrality.ipynb`).
Oracle: networkx betweenness_centrality_subset.

Run: python demo/09_betweenness_centrality.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import networkx as nx  # noqa: E402

from pygraphblas_tpu import Matrix, types  # noqa: E402
from pygraphblas_tpu.algorithms import betweenness_centrality  # noqa: E402

G = nx.powerlaw_cluster_graph(600, 4, 0.2, seed=11)
n = G.number_of_nodes()
rows, cols = [], []
for u, v in G.edges():
    rows += [u, v]
    cols += [v, u]
A = Matrix.sparse(types.FP32, n, n)
A._build(np.asarray(rows, np.int64), np.asarray(cols, np.int64),
         np.ones(len(rows), np.float32))

sources = [3, 17, 42, 99]
c = betweenness_centrality(A, sources)
got = np.zeros(n)
for i, v in c:
    got[i] = v

# networkx: unnormalized subset BC counts each unordered pair once;
# the batched matrix formulation accumulates both directions.
want_d = nx.betweenness_centrality_subset(
    G, sources=sources, targets=list(G.nodes()), normalized=False)
want = np.array([want_d[i] for i in range(n)]) * 2.0

err = np.max(np.abs(got - want) / np.maximum(1.0, np.abs(want)))
assert err < 1e-3, err
top = np.argsort(-got)[:5]
print("top-5 central vertices:", top.tolist())
print(f"max relative error vs networkx: {err:.2e}")
print("OK")
