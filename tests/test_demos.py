"""The demo gallery is executable documentation (reference: 16 demo
notebooks validated by Binder; here: scripts run in CI, each with an
internal oracle assert)."""

import subprocess
import sys
from pathlib import Path

import pytest

DEMOS = sorted((Path(__file__).parent.parent / "demo").glob("[0-9]*.py"))


@pytest.mark.parametrize("script", DEMOS, ids=[d.name for d in DEMOS])
def test_demo_runs(script):
    res = subprocess.run([sys.executable, str(script)],
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "OK" in res.stdout
