"""Exhaustive mask/accumulator/descriptor writeback semantics.

The GraphBLAS spec's C<M> (accum)= T rules are the heart of every
operation; these tests pin the full truth table (value vs structural
masks, complement, replace, accum union) on small matrices.
"""

import numpy as np

from pygraphblas_tpu import Matrix, Vector, types, descriptor


def M(vals_2d, typ=types.INT64):
    a = np.asarray(vals_2d)
    m = Matrix.sparse(typ, *a.shape)
    r, c = np.nonzero(a)
    m._build(r.astype(np.int64), c.astype(np.int64), a[r, c])
    return m


def test_value_mask_vs_structural_mask():
    A = M([[1, 2], [3, 4]])
    # mask has an explicit FALSE entry at (0,0): value mask excludes it,
    # structural mask includes it
    mask = Matrix.sparse(types.BOOL, 2, 2)
    mask[0, 0] = False
    mask[0, 1] = True
    out_v = A.apply(types.INT64.IDENTITY, mask=mask)
    assert out_v.to_lists() == [[0], [1], [2]]
    out_s = A.apply(types.INT64.IDENTITY, mask=mask, desc=descriptor.S)
    assert out_s.to_lists() == [[0, 0], [0, 1], [1, 2]]


def test_complement_mask():
    A = M([[1, 2], [3, 4]])
    mask = Matrix.from_lists([0], [0], [True], 2, 2)
    out = A.apply(types.INT64.IDENTITY, mask=mask, desc=descriptor.C)
    assert (0, 0) not in out
    assert out.nvals == 3


def test_replace_semantics():
    A = M([[1, 2], [3, 4]])
    out = M([[9, 9], [9, 9]])
    mask = Matrix.from_lists([0], [0], [True], 2, 2)
    # no replace: outside-mask entries of out are KEPT
    A.apply(types.INT64.AINV, out=out.dup(), mask=mask)
    kept = out.dup()
    A.apply(types.INT64.AINV, out=kept, mask=mask)
    assert kept[0, 0] == -1
    assert kept[1, 1] == 9
    # replace: outside-mask entries are DELETED
    repl = out.dup()
    A.apply(types.INT64.AINV, out=repl, mask=mask, desc=descriptor.R)
    assert repl[0, 0] == -1
    assert repl.nvals == 1


def test_accum_union_semantics():
    A = M([[1, 0], [0, 4]])
    out = M([[10, 20], [0, 0]])
    A.apply(types.INT64.IDENTITY, out=out, accum=types.INT64.PLUS)
    # (0,0): both present -> 10+1; (0,1): only C -> kept; (1,1): only T
    assert out[0, 0] == 11
    assert out[0, 1] == 20
    assert out[1, 1] == 4


def test_accum_with_mask_and_replace():
    A = M([[1, 2], [3, 4]])
    out = M([[10, 20], [30, 0]])
    mask = Matrix.from_lists([0, 0], [0, 1], [True, True], 2, 2)
    A.apply(types.INT64.IDENTITY, out=out, accum=types.INT64.PLUS,
            mask=mask, desc=descriptor.R)
    assert out[0, 0] == 11
    assert out[0, 1] == 22
    assert out.nvals == 2  # row 1 replaced away


def test_no_mask_full_overwrite():
    A = M([[1, 0], [0, 4]])
    out = M([[9, 9], [9, 9]])
    A.apply(types.INT64.IDENTITY, out=out)
    assert out.nvals == 2
    assert out[0, 0] == 1
    assert (0, 1) not in out


def test_vector_mask_semantics():
    v = Vector.from_list([1, 2, 3])
    mask = Vector.sparse(types.BOOL, 3)
    mask[0] = True
    mask[2] = False
    out_v = v.apply(types.INT64.AINV, mask=mask)
    assert out_v.to_lists() == [[0], [-1]]
    out_s = v.apply(types.INT64.AINV, mask=mask, desc=descriptor.S)
    assert out_s.to_lists() == [[0, 2], [-1, -3]]
    out_c = v.apply(types.INT64.AINV, mask=mask, desc=descriptor.C)
    assert out_c.to_lists() == [[1, 2], [-2, -3]]
    # complement + structural
    out_sc = v.apply(types.INT64.AINV, mask=mask,
                     desc=descriptor.S & descriptor.C)
    assert out_sc.to_lists() == [[1], [-2]]


def test_mxm_structural_complement_replace():
    A = M([[1, 1], [1, 1]], types.FP64)
    out = Matrix.dense(types.FP64, 2, 2, fill=5.0)
    mask = Matrix.from_lists([0], [1], [True], 2, 2)
    A.mxm(A, out=out, mask=mask, desc=descriptor.RSC)
    # complement of {(0,1)} = other 3 cells; replace deletes (0,1)
    assert out.nvals == 3
    assert (0, 1) not in out
    assert out[0, 0] == 2.0


def test_transpose_with_mask_accum():
    A = M([[0, 2], [3, 0]])
    out = M([[1, 0], [0, 1]])
    A.transpose(out=out, accum=types.INT64.PLUS)
    assert out[0, 0] == 1
    assert out[0, 1] == 3
    assert out[1, 0] == 2
    assert out[1, 1] == 1


def test_eadd_masked_into_existing():
    A = M([[1, 0], [0, 1]])
    B = M([[0, 2], [2, 0]])
    out = M([[7, 7], [7, 7]])
    mask = Matrix.from_lists([0, 1], [0, 1], [True, True], 2, 2)
    A.eadd(B, out=out, mask=mask)
    # inside mask: T values (diag of A since B empty there)
    assert out[0, 0] == 1
    assert out[1, 1] == 1
    # outside mask kept
    assert out[0, 1] == 7
