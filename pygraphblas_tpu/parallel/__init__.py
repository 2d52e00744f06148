"""Multi-chip distribution: device meshes, block-partitioned sparse
containers, and collective-based semiring kernels.

The reference has no distributed execution at all (SURVEY §2.3); this
subsystem is the TPU-native scaling tier mandated by BASELINE.json —
row/block partitioning over a ``jax.sharding.Mesh`` with frontier/halo
exchange via XLA collectives over ICI.
"""

from .dist import DistSpMV, dist_pagerank_step, make_mesh

__all__ = ["DistSpMV", "dist_pagerank_step", "make_mesh"]
