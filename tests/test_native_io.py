"""Native IO runtime (C++ parser + radix canonicalizer) vs Python paths."""

import numpy as np
import pytest

from pygraphblas_tpu.io.native import HAVE_NATIVE
from pygraphblas_tpu import Matrix, types

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native extension not built")


def test_sort_dedup_matches_python():
    from pygraphblas_tpu.io.native import sort_dedup_native
    from pygraphblas_tpu.core import coosparse as ck

    rng = np.random.RandomState(0)
    n = 200_000
    rows = rng.randint(0, 1000, n)
    cols = rng.randint(0, 1000, n)
    vals = rng.rand(n)
    r1, c1, v1 = sort_dedup_native(rows, cols, vals)
    order = np.lexsort((cols, rows))
    rs, cs, vs = rows[order], cols[order], vals[order]
    uniq = np.empty(len(rs), bool)
    uniq[:-1] = (rs[:-1] != rs[1:]) | (cs[:-1] != cs[1:])
    uniq[-1] = True
    assert np.array_equal(r1, rs[uniq])
    assert np.array_equal(c1, cs[uniq])
    assert np.array_equal(v1, vs[uniq])


def test_parse_mm_native(tmp_path):
    p = tmp_path / "t.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\n"
                 "% comment\n"
                 "3 3 3\n"
                 "1 2 1.5\n"
                 "2 3 2.5\n"
                 "3 1 3.5\n")
    M = Matrix.from_mm(p)
    assert M.type is types.FP64
    assert M.shape == (3, 3)
    assert M[0, 1] == 1.5
    assert M[2, 0] == 3.5


def test_parse_mm_symmetric(tmp_path):
    p = tmp_path / "s.mtx"
    p.write_text("%%MatrixMarket matrix coordinate pattern symmetric\n"
                 "3 3 2\n"
                 "2 1\n"
                 "3 2\n")
    M = Matrix.from_mm(p)
    assert M.type is types.BOOL
    assert M.nvals == 4
    assert (0, 1) in M and (1, 0) in M


def test_large_build_uses_native():
    rng = np.random.RandomState(1)
    n = 100_000
    rows = rng.randint(0, 10_000, n)
    cols = rng.randint(0, 10_000, n)
    vals = rng.rand(n).astype(np.float32)
    M = Matrix.sparse(types.FP32, 100_000, 100_000)
    M._build(rows, cols, vals)
    r, c, v = M._coo()
    assert (np.diff(r) >= 0).all()
    assert M.nvals == len(r)
