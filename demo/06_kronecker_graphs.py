"""Kronecker graph generation at huge logical dimensions.

`kronpow` expands a small seed adjacency into a scale-free graph whose
logical dimension squares at every step — the hypersparse tier keeps
memory O(nnz), exactly like the reference's Kronecker/Sierpinski
notebooks over 2^60-dim matrices.

Run: python demo/06_kronecker_graphs.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from pygraphblas_tpu import Matrix, types  # noqa: E402

seed = Matrix.from_lists([0, 0, 1, 1, 2], [0, 1, 1, 2, 0],
                         [1.0, 1.0, 1.0, 1.0, 1.0])
print("seed graph:")
print(seed)

G = seed.dup()
for step in range(6):
    G = G.kronecker(G) if step < 2 else G.kronecker(seed)
    print(f"after step {step + 1}: shape={G.shape} nvals={G.nvals}")

deg = G.out_degree()
print("max out-degree:", deg.max(), " vertices with edges:", deg.nvals)
assert G.nvals == 5 ** 8  # |E| multiplies per kron step
print("OK")
