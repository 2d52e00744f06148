"""Network-mocked test for Matrix.ssget and its binary cache
(reference matrix.py:596-624)."""
import sys
import types as pytypes

import pytest

from pygraphblas_tpu import Matrix


@pytest.fixture
def fake_ssgetpy(tmp_path, monkeypatch):
    """Install a fake ssgetpy module whose download() extracts a tiny
    Matrix-Market file into tmp_path, counting MM parses."""
    mtx = tmp_path / "karate.mtx"
    mtx.write_text(
        "%%MatrixMarket matrix coordinate integer general\n"
        "3 3 3\n"
        "1 2 7\n"
        "2 3 9\n"
        "3 1 4\n"
    )

    class _Result:
        def download(self, extract=True):
            return str(tmp_path), None

    mod = pytypes.ModuleType("ssgetpy")
    mod.search = lambda q=None: [_Result()]
    monkeypatch.setitem(sys.modules, "ssgetpy", mod)

    calls = {"from_mm": 0}
    orig = Matrix.from_mm.__func__

    def counting(cls, *a, **k):
        calls["from_mm"] += 1
        return orig(cls, *a, **k)

    monkeypatch.setattr(Matrix, "from_mm", classmethod(counting))
    return tmp_path, calls


def test_ssget_yields_matrices(fake_ssgetpy):
    tmp_path, calls = fake_ssgetpy
    out = list(Matrix.ssget("Newman/karate"))
    assert len(out) == 1
    name, M = out[0]
    assert name == "karate.mtx"
    assert M.shape == (3, 3) and M.nvals == 3
    assert M[0, 1] == 7 and M[2, 0] == 4
    # no cache dir -> no .grb written
    assert not list(tmp_path.glob("*.grb"))


def test_ssget_binary_cache_roundtrip(fake_ssgetpy):
    tmp_path, calls = fake_ssgetpy
    (name1, M1), = Matrix.ssget("Newman/karate", binary_cache_dir=True)
    assert calls["from_mm"] == 1
    grb = tmp_path / "karate.mtx.grb"
    assert grb.exists()
    # second call loads from the binfile, skipping the MM parse
    (name2, M2), = Matrix.ssget("Newman/karate", binary_cache_dir=True)
    assert calls["from_mm"] == 1
    assert name2 == name1 and M2.iseq(M1)
