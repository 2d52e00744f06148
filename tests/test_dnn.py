"""GraphChallenge DNN inference with the category truth oracle
(reference demo/dnn/challenge.py:67-76), at a size that forces the
huge-matrix tier for the image batch."""

import numpy as np

from pygraphblas_tpu.base import config


def test_dnn_category_oracle_reduced():
    from demo.dnn.challenge import run_fullscale

    run_fullscale(nneurons=64, nlayers=10, nimages=3000)


def test_dnn_category_oracle_forced_sparse():
    """Same recurrence with the image batch forced onto the COO tier
    (unmasked sparse SpGEMM + sparse select/assign)."""
    from demo.dnn.challenge import run_fullscale

    old = config.bitmap_max_cells
    config.bitmap_max_cells = 1
    try:
        run_fullscale(nneurons=32, nlayers=6, nimages=400)
    finally:
        config.bitmap_max_cells = old
