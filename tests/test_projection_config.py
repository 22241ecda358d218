"""Tests for §2.7 driver-side helpers: F7 linear projection UDF shape
and norm, F8 optimal-dim heuristic, F9 mobile tiers, F10 dotted config,
F4 nearest-dim snap — plus the S1/S2 CSV scan sources.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from multimodal_vector_db_spark.config import EngineConfig
from multimodal_vector_db_spark.functions.projection import (
    deterministic_weights,
    linear_project_udf,
    mobile_tier_dim,
    nearest_supported_dim,
    optimal_dimension,
)

SF_DIR = "/root/testdata/sf0.001"


def test_linear_projection_shape_and_unit_norm(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(20)
    project = linear_project_udf(deterministic_weights(64, 16))
    rows = emb.select("vec_id", project(F.col("embedding")).alias("p")).collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["p"]) == 16
        assert abs(math.sqrt(sum(x * x for x in r["p"])) - 1.0) < 1e-9


def test_optimal_dimension_heuristic():
    # projection.py:265-301 semantics: largest dim fitting both budgets
    assert optimal_dimension(1000, memory_budget_bytes=10**9, latency_budget_ms=10) == 512
    assert optimal_dimension(10**6, memory_budget_bytes=300 * 10**6, latency_budget_ms=10) == 128
    # nothing fits → minimum dim
    assert optimal_dimension(10**9, memory_budget_bytes=10**6, latency_budget_ms=0.001) == 64


def test_mobile_tier_and_nearest_dim():
    assert mobile_tier_dim("high") == 512
    assert mobile_tier_dim("ultra_low") == 64
    assert mobile_tier_dim("unknown") == 256  # projection.py default
    assert nearest_supported_dim(100) == 128  # projection.py:201-205
    assert nearest_supported_dim(600) == 512


def test_dotted_config_get_set_roundtrip(tmp_path):
    cfg = EngineConfig()
    assert cfg.get("index.metric") == "cosine"
    cfg.set("index.metric", "l2")
    cfg.set("new.nested.key", 7)
    assert cfg.get("index.metric") == "l2"
    assert cfg.get("new.nested.key") == 7
    assert cfg.get("missing.path", "dflt") == "dflt"
    path = str(tmp_path / "cfg.json")
    cfg.save(path)
    assert EngineConfig.load(path).get("new.nested.key") == 7


def test_csv_scan_sources(spark, tmp_path):
    # S1/S2 (build_all_indices.py:38,178): header CSV → typed columns
    csv = tmp_path / "esc50.csv"
    csv.write_text(
        "filename,category,fold,esc10\n"
        "bark.wav,dog,1,true\n"
        "rain.wav,rain,2,false\n"
    )
    df = spark.read.csv(str(csv), header=True, inferSchema=True)
    rows = {r["filename"]: r for r in df.collect()}
    assert rows["bark.wav"]["category"] == "dog"
    assert rows["bark.wav"]["fold"] == 1
    assert rows["rain.wav"]["esc10"] is False
