"""Smoke-run every shipped example script at the smallest fixture.

The examples are the user-facing front door (README points at them);
this sweep keeps them executable as the catalog evolves — a renamed
registry entry or changed helper signature fails HERE instead of on a
user's machine. Each script runs in-process (runpy) against sf0.001 so
the whole sweep stays cheap; scripts share the session-scoped Spark
fixture via get_spark's active-session reuse.
"""

from __future__ import annotations

import os
import runpy
from pathlib import Path

import pytest

EXAMPLES = sorted(
    p for p in (Path(__file__).parent.parent / "examples").glob("*.py")
)


@pytest.mark.slow
@pytest.mark.parametrize("script", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(spark, script, monkeypatch, capsys):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    runpy.run_path(str(script), run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip(), f"{script.name} printed nothing"
    assert "Traceback" not in out
