"""Fuzz the coosem merge primitives (native single-pass C++ and the
numpy fallbacks) against brute-force dict oracles.

The sorted-merge tier carries the full mask/accum/replace semantics of
the COO ("huge") containers (reference matrix.py:2572-2583 semantics);
these tests pin the two execution paths to each other and to a
dictionary model.
"""
import numpy as np
import pytest

from pygraphblas_tpu.core import coosem as cs


def _rand_canonical(rng, n, dim=50):
    k = rng.choice(dim * dim, size=n, replace=False)
    r, c = k // dim, k % dim
    order = np.lexsort((c, r))
    return (r[order].astype(np.int64), c[order].astype(np.int64),
            rng.randn(n))


def _as_dict(r, c, v):
    return {(int(a), int(b)): x for a, b, x in zip(r, c, v)}


@pytest.fixture(params=["native", "fallback"])
def merge_env(request, monkeypatch):
    if request.param == "fallback":
        monkeypatch.setattr(cs, "_fastio", None)
    elif cs._fastio is None:
        pytest.skip("native extension not built")
    return request.param


def test_union_merge_fuzz(merge_env):
    rng = np.random.RandomState(3)
    for trial in range(20):
        na, nb = rng.randint(0, 60, 2)
        ra, ca, va = _rand_canonical(rng, na)
        rb, cb, vb = _rand_canonical(rng, nb)
        r, c, v = cs.union_merge(ra, ca, va, rb, cb, vb,
                                 lambda x, y: x + y, np.float64)
        da, db = _as_dict(ra, ca, va), _as_dict(rb, cb, vb)
        want = dict(da)
        for k, x in db.items():
            want[k] = want.get(k, 0.0) + x if k in da else x
        assert _as_dict(r, c, v) == pytest.approx(want)
        # canonical order out
        keys = [(int(a), int(b)) for a, b in zip(r, c)]
        assert keys == sorted(keys)


def test_writeback_fuzz(merge_env):
    rng = np.random.RandomState(7)
    for trial in range(40):
        nc, nt, nm = rng.randint(0, 40, 3)
        crr, ccc, cv = _rand_canonical(rng, nc)
        tr, tc, tv = _rand_canonical(rng, nt)
        mr, mc, _ = _rand_canonical(rng, nm)
        complement = bool(rng.randint(2))
        replace = bool(rng.randint(2))
        accum = (lambda x, y: x + y) if rng.randint(2) else None
        use_mask = bool(rng.randint(2))
        mpr, mpc = (mr, mc) if use_mask else (None, None)
        r, c, v = cs.writeback(crr, ccc, cv, tr, tc, tv, mpr, mpc,
                               accum, complement, replace, np.float64)
        # dict oracle
        dc, dt = _as_dict(crr, ccc, cv), _as_dict(tr, tc, tv)
        z = dict(dt)
        if accum is not None:
            z = dict(dc)
            for k, x in dt.items():
                z[k] = z.get(k, 0.0) + x if k in dc else x
        if not use_mask:
            mset = None
        else:
            mset = {(int(a), int(b)) for a, b in zip(mr, mc)}

        def in_region(k):
            if mset is None:
                return not complement
            return (k in mset) != complement

        want = {}
        for k, x in z.items():
            if in_region(k):
                want[k] = x
        if not replace:
            for k, x in dc.items():
                if not in_region(k):
                    want[k] = x
        assert _as_dict(r, c, v) == pytest.approx(want)
        keys = [(int(a), int(b)) for a, b in zip(r, c)]
        assert keys == sorted(keys)


def test_merge_union_idx_paths_agree():
    if cs._fastio is None:
        pytest.skip("native extension not built")
    rng = np.random.RandomState(11)
    for trial in range(10):
        ka = np.unique(rng.randint(0, 1000, rng.randint(0, 80)))
        kb = np.unique(rng.randint(0, 1000, rng.randint(0, 80)))
        ia_n, ib_n = cs._merge_union_idx(ka, kb)
        real = cs._fastio
        try:
            cs._fastio = None
            ia_f, ib_f = cs._merge_union_idx(ka, kb)
        finally:
            cs._fastio = real
        assert np.array_equal(ia_n, ia_f)
        assert np.array_equal(ib_n, ib_f)


def test_in_sorted_sorted_queries_matches_general():
    rng = np.random.RandomState(13)
    for trial in range(10):
        r, c, _ = _rand_canonical(rng, rng.randint(0, 60))
        sr, sc, _ = _rand_canonical(rng, rng.randint(0, 60))
        a = cs.in_sorted(r, c, sr, sc)
        b = cs.in_sorted(r, c, sr, sc, sorted_queries=True)
        assert np.array_equal(np.asarray(a), np.asarray(b))


def _rand_selector(rng, dim, out_max=30):
    kind = rng.randint(4)
    if kind == 0:  # forward range/stride (monotone)
        start = rng.randint(0, dim // 2)
        step = rng.randint(1, 4)
        size = rng.randint(1, out_max)
        return cs.ArithSelector(start, step, size)
    if kind == 1:  # backwards (non-monotone)
        start = rng.randint(dim // 2, dim)
        step = -rng.randint(1, 4)
        size = rng.randint(1, min(out_max, start // -step + 1))
        return cs.ArithSelector(start, step, size)
    size = rng.randint(1, out_max)
    idx = rng.choice(dim, size=size, replace=False)
    if kind == 2:  # sorted list (monotone)
        idx = np.sort(idx)
    return cs.ListSelector(idx)


def test_extract_fuzz_monotone_and_not(merge_env):
    rng = np.random.RandomState(17)
    for trial in range(30):
        r, c, v = _rand_canonical(rng, rng.randint(0, 80))
        sel_r = _rand_selector(rng, 50)
        sel_c = _rand_selector(rng, 50)
        er, ec, ev = cs.extract(r, c, v, sel_r, sel_c)
        src = _as_dict(r, c, v)
        want = {}
        for a in range(sel_r.size):
            for b in range(sel_c.size):
                k = (int(sel_r.inverse(np.array([a]))[0]),
                     int(sel_c.inverse(np.array([b]))[0]))
                if k in src:
                    want[(a, b)] = src[k]
        assert _as_dict(er, ec, ev) == pytest.approx(want)
        keys = [(int(a), int(b)) for a, b in zip(er, ec)]
        assert keys == sorted(keys)


def test_assign_region_fuzz_monotone_and_not(merge_env):
    rng = np.random.RandomState(23)
    for trial in range(30):
        crr, ccc, cv = _rand_canonical(rng, rng.randint(0, 80))
        sel_r = _rand_selector(rng, 50)
        sel_c = _rand_selector(rng, 50)
        # T in region coordinates, canonical
        nt = rng.randint(0, sel_r.size * sel_c.size + 1)
        kt = rng.choice(sel_r.size * sel_c.size,
                        size=min(nt, sel_r.size * sel_c.size), replace=False)
        tr = np.sort(kt).astype(np.int64) // sel_c.size
        tc = np.sort(kt).astype(np.int64) % sel_c.size
        tv = rng.randn(len(kt))
        mr, mc, _ = _rand_canonical(rng, rng.randint(0, 40))
        use_mask = bool(rng.randint(2))
        complement = bool(rng.randint(2))
        replace = bool(rng.randint(2))
        accum = (lambda x, y: x + y) if rng.randint(2) else None
        got = cs.assign_region(crr, ccc, cv, tr, tc, tv, sel_r, sel_c,
                               mr if use_mask else None,
                               mc if use_mask else None,
                               accum, complement, replace, np.float64)

        # dict oracle
        dc = _as_dict(crr, ccc, cv)
        rinv = {a: int(sel_r.inverse(np.array([a]))[0])
                for a in range(sel_r.size)}
        cinv = {b: int(sel_c.inverse(np.array([b]))[0])
                for b in range(sel_c.size)}
        region = {(rinv[a], cinv[b])
                  for a in range(sel_r.size) for b in range(sel_c.size)}
        dt = {(rinv[int(a)], cinv[int(b)]): x for a, b, x in zip(tr, tc, tv)}
        z = dict(dt)
        if accum is not None:
            z = {k: x for k, x in dc.items() if k in region}
            for k, x in dt.items():
                z[k] = z.get(k, 0.0) + x if k in z else x
        mset = ({(int(a), int(b)) for a, b in zip(mr, mc)}
                if use_mask else None)

        def in_region(k):
            if mset is None:
                return not complement
            return (k in mset) != complement

        want = {k: x for k, x in dc.items() if k not in region}
        for k, x in z.items():
            if in_region(k):
                want[k] = x
        if not replace:
            for k, x in dc.items():
                if k in region and not in_region(k):
                    want[k] = x
        assert _as_dict(*got) == pytest.approx(want)
        keys = [(int(a), int(b)) for a, b in zip(got[0], got[1])]
        assert keys == sorted(keys)
