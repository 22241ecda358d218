"""Warehouse storage tests (SURVEY §2.1 S8-S11, §2.4 A13): partitioned
index save/load round-trip, manifest persistence, config round-trip,
size accounting, and the partition-pruning layout the reference's
per-modality indexes map to.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from multimodal_vector_db_spark.sources.storage import CorpusStorage

SF_DIR = "/root/testdata/sf0.001"


def _items(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("video"), F.lit("audio"), F.lit("text")),
        (F.col("label") % 4 + 1).cast("int"),
    )
    return emb.select(
        F.col("vec_id").alias("id"), "embedding", modality.alias("modality")
    )


def test_save_load_round_trip_partitioned(spark, tmp_path):
    store = CorpusStorage(str(tmp_path / "wh"))
    items = _items(spark)
    store.save_index(
        items,
        "unified",
        manifest={"dimension": 64, "metric": "cosine", "use_fp16": False},
        partition_by=["modality"],
    )
    loaded, manifest = store.load_index(spark, "unified")
    assert loaded.count() == items.count()
    assert manifest["dimension"] == 64
    assert manifest["metric"] == "cosine"
    assert manifest["partition_by"] == ["modality"]
    # same content, column order independent
    assert (
        loaded.select("id").exceptAll(items.select("id")).count() == 0
    )


def test_partition_layout_enables_pruning(spark, tmp_path):
    # S8 layout check: one subdirectory per modality → WHERE modality=x
    # touches only that partition's files (the 6.74× speedup in
    # relational form, README.md:150-153)
    import os

    store = CorpusStorage(str(tmp_path / "wh"))
    store.save_index(_items(spark), "uni", partition_by=["modality"])
    subdirs = {
        d for d in os.listdir(tmp_path / "wh" / "indices" / "uni")
        if d.startswith("modality=")
    }
    assert subdirs == {
        "modality=image", "modality=video", "modality=audio", "modality=text"
    }
    loaded, _ = store.load_index(spark, "uni")
    audio = loaded.where(F.col("modality") == "audio")
    assert audio.count() > 0


def test_config_exists_size_clear(spark, tmp_path):
    store = CorpusStorage(str(tmp_path / "wh"))
    store.save_config({"engine": "spark", "metric": "cosine"})
    assert store.load_config()["metric"] == "cosine"
    assert not store.exists("nope")
    store.save_index(_items(spark), "tiny")
    assert store.exists("tiny")
    # A13 storage-per-vector: bytes / n (metrics.py:168-200)
    n = _items(spark).count()
    per_vector = store.get_size_bytes() / n
    assert per_vector > 0
    store.clear()
    assert not store.exists("tiny")


def test_save_index_with_zone_maps_prunes_range_reads(spark, tmp_path):
    """stats_cols at save time persists per-file zone maps; range reads
    plan from that table, open only surviving files, and return exactly
    the predicate's rows."""
    from multimodal_vector_db_spark.operators.pruning import prune_files
    from multimodal_vector_db_spark.sources.storage import CorpusStorage

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    # range-layout on vec_id so per-file ranges are tight
    laid_out = emb.repartitionByRange(8, "vec_id").sortWithinPartitions(
        "vec_id"
    )
    storage = CorpusStorage(str(tmp_path))
    storage.save_index(
        laid_out, "emb_zm", manifest={"dim": 64}, stats_cols=["vec_id"]
    )

    got = storage.read_index_range(spark, "emb_zm", "vec_id", 10, 40)
    want = emb.where((F.col("vec_id") >= 10) & (F.col("vec_id") <= 40))
    assert sorted(r["vec_id"] for r in got.collect()) == sorted(
        r["vec_id"] for r in want.collect()
    )

    # and the zone maps actually pruned: the narrow range must NOT keep
    # every file
    import os

    stats = spark.read.parquet(
        os.path.join(str(tmp_path), "indices", "emb_zm.stats.parquet")
    )
    kept = prune_files(stats, "vec_id", 10, 40)
    assert 0 < len(kept) < stats.count()

    # unsaved column refuses cleanly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        storage.read_index_range(spark, "emb_zm", "label", 0, 1)


def test_build_matryoshka_tables_round_trip(spark, tmp_path):
    """SURVEY §1.4 / reference build_matryoshka_indices.py:55-91: one
    materialized table per truncation dim; each stores slice_renormalize'd
    vectors (unit-norm prefixes) and its own manifest, so reduced-dim
    search scans reduced-dim data."""
    import numpy as np

    from multimodal_vector_db_spark.functions.vector import (
        slice_renormalize,
    )

    store = CorpusStorage(str(tmp_path / "wh"))
    items = _items(spark)
    names = store.build_matryoshka_tables(
        items, "emb", dims=[16, 32], partition_by=["modality"]
    )
    assert names == {16: "emb_d16", 32: "emb_d32"}
    n = items.count()
    for d in (16, 32):
        loaded, manifest = store.load_index(spark, f"emb_d{d}")
        assert manifest["dim"] == d
        assert manifest["parent"] == "emb"
        assert loaded.count() == n
        row = loaded.where(F.col("id") == 5).first()
        assert len(row["embedding"]) == d
        assert abs(float(np.linalg.norm(row["embedding"])) - 1.0) < 1e-5
        # stored vectors == on-the-fly truncation of the full corpus
        want = {
            r["id"]: r["t"]
            for r in items.select(
                "id", slice_renormalize("embedding", d).alias("t")
            ).collect()
        }
        got = {r["id"]: r["embedding"] for r in loaded.collect()}
        assert set(got) == set(want)
        sample = sorted(got)[:20]
        for i in sample:
            assert np.allclose(got[i], want[i], atol=1e-6)
