"""Shim for editable installs; metadata lives in pyproject.toml.

The optional native runtime (MatrixMarket fast parser, radix
sort/dedup, Benes coloring) is built separately with ``native/build.sh``
— the package falls back to pure numpy paths when the extension is
absent (see pygraphblas_tpu/io/native.py).
"""

from setuptools import setup

setup()
