"""The quickstart example must keep running end-to-end (subprocess: it
owns and stops its SparkSession)."""

from __future__ import annotations

import subprocess
import sys


def test_quickstart_runs():
    out = subprocess.run(
        [sys.executable, "/root/repo/examples/quickstart.py"],
        capture_output=True,
        text=True,
        timeout=280,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "== training shards" in out.stdout
    assert "== exact kNN" in out.stdout


def test_corpus_refresh_runs():
    out = subprocess.run(
        [sys.executable, "/root/repo/examples/corpus_refresh.py"],
        capture_output=True,
        text=True,
        timeout=280,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "== incremental dedup" in out.stdout
    assert "== splits (cluster-hashed)" in out.stdout
    assert "== contrastive pairs" in out.stdout
