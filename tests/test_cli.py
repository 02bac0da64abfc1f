"""CLI smoke tests at the real surface (subprocess, fresh interpreter)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str):
    return subprocess.run([sys.executable, "-m", "integrator_spark", *args],
                          cwd=REPO, capture_output=True, text=True,
                          timeout=240)


def test_cli_list_shows_catalog():
    p = _run("list")
    assert p.returncode == 0
    assert "q1_pricing_summary" in p.stdout
    assert "vec_knn" in p.stdout


def test_cli_oracle_prints_sql():
    p = _run("oracle", "q1_pricing_summary")
    assert p.returncode == 0
    assert "GROUP BY l_returnflag" in p.stdout


def test_cli_unknown_query_fails_cleanly():
    p = _run("run", "no_such_query")
    assert p.returncode == 2
    assert "unknown query" in p.stderr
