"""Compute kernels: dense/bitmap backend, sorted-COO sparse backend,
Pallas TPU kernels, and the format-dispatch layer."""
