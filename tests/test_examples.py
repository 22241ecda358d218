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


def test_curation_pipeline_runs():
    out = subprocess.run(
        [sys.executable, "/root/repo/examples/curation_pipeline.py"],
        capture_output=True,
        text=True,
        timeout=400,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # the funnel must be monotone non-increasing through the gates
    import re

    stages = dict(
        re.findall(r"^\s*(\w+): (\d+)$", out.stdout, re.MULTILINE)
    )
    order = [
        "raw",
        "lang_gate",
        "quality_ensemble",
        "nb_filter",
        "boilerplate_strip",
        "span_dedup",
        "minhash_dedup",
        "decontaminated",
        "dsir_resampled",
    ]
    ns = [int(stages[s]) for s in order]
    assert all(a >= b for a, b in zip(ns, ns[1:])), ns
    assert ns[-1] > 0 and int(stages["shards"]) > 0


def test_multimodal_funnel_example_runs():
    out = subprocess.run(
        [sys.executable, "/root/repo/examples/multimodal_funnel.py"],
        capture_output=True,
        text=True,
        timeout=400,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "multimodal training-data funnel" in out.stdout
    assert "budget_mix" in out.stdout
    assert "final keep rate" in out.stdout


def test_curated_batches_example_runs():
    out = subprocess.run(
        [sys.executable, "/root/repo/examples/curated_batches.py"],
        capture_output=True,
        text=True,
        timeout=500,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "curated training batches" in out.stdout
    assert "subword tokens" in out.stdout


def test_serving_routes_runs():
    out = subprocess.run(
        [sys.executable, "/root/repo/examples/serving_routes.py"],
        capture_output=True,
        text=True,
        timeout=400,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "calibration points" in out.stdout
    assert "route=ivf" in out.stdout          # some floor routes IVF
    assert "auto-append" in out.stdout
    assert "late doc retrievable: True" in out.stdout
    assert "scorer override" in out.stdout
