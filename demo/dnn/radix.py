"""RadiX-Net sparse DNN topology generator.

Builds mixed-radix butterfly layer topologies (the structure used by the
GraphChallenge synthetic DNNs; reference ``demo/dnn/radix.py``): each
layer's connectivity is a Kronecker-structured permuted butterfly so
every input reaches every output in ``len(radices)`` layers with uniform
in/out degree.
"""

import numpy as np


def radix_topology(radices):
    """Return a list of (rows, cols) edge lists, one per layer, for a
    RadiX-Net with the given mixed radices; n = prod(radices) neurons."""
    n = int(np.prod(radices))
    layers = []
    stride = 1
    for r in radices:
        src = np.arange(n)
        # each neuron connects to r neighbors in its radix group
        offsets = np.arange(r) * stride
        group = (src // (stride * r)) * (stride * r)
        pos = src % stride
        dst = group[:, None] + pos[:, None] + offsets[None, :]
        rows = np.repeat(src, r)
        cols = dst.reshape(-1)
        layers.append((rows, cols % n))
        stride *= r
    return n, layers


def radix_net(radices, nlayers, typ=None, weight=None, seed=42):
    """Materialize `nlayers` weight matrices cycling over the butterfly
    topology, as Matrix objects."""
    from pygraphblas_tpu import types, Matrix

    typ = typ or types.FP32
    n, topo = radix_topology(radices)
    rng = np.random.RandomState(seed)
    mats = []
    for layer in range(nlayers):
        rows, cols = topo[layer % len(topo)]
        if weight is None:
            vals = rng.rand(len(rows)).astype(typ._numpy_t)
        else:
            vals = np.full(len(rows), weight, typ._numpy_t)
        W = Matrix.sparse(typ, n, n)
        W._build(rows, cols, vals)
        mats.append(W)
    return n, mats
