"""Structured Streaming tests (SURVEY §2.11 extension): the streaming
plans must produce exactly the batch results on the same input, and the
foreachBatch upsert must be idempotent under file replay/overlap.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from multimodal_vector_db_spark.streaming import (
    events_stream,
    ingest_events_to_corpus,
    run_available_now,
    session_windowed_counts,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _stage_events(spark, tmp_path):
    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "part-000.parquet")
    return str(src)


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    src = _stage_events(spark, tmp_path)
    stream = windowed_counts(events_stream(spark, src))
    run_available_now(
        stream,
        str(tmp_path / "ckpt"),
        query_name="win_test",
        output_mode="complete",
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql("SELECT * FROM win_test").collect()
    }
    batch = windowed_counts(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_streaming_session_windows_run(spark, tmp_path):
    src = _stage_events(spark, tmp_path)
    stream = session_windowed_counts(events_stream(spark, src), gap="30 minutes")
    run_available_now(
        stream,
        str(tmp_path / "ckpt_sess"),
        query_name="sess_test",
        output_mode="complete",
    )
    rows = spark.sql("SELECT * FROM sess_test").collect()
    assert len(rows) > 0
    # sessions are per-user, non-negative length, and event-conserving
    assert all(r["session_end"] >= r["session_start"] for r in rows)
    total = sum(r["n_events"] for r in rows)
    assert total == spark.read.parquet(f"{SF_DIR}/events.parquet").count()


def test_foreach_batch_upsert_is_idempotent(spark, tmp_path):
    src = tmp_path / "ingest_src"
    src.mkdir()
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt_ingest")

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").orderBy("event_id")
    first = ev.limit(100)
    # second file OVERLAPS the first on event_id 50..99
    second = ev.where((F.col("event_id") >= 50) & (F.col("event_id") < 150))
    first.coalesce(1).write.parquet(str(src / "batch_a"))

    stream = events_stream(spark, f"{src}/*")
    ingest_events_to_corpus(stream, corpus, ckpt).start().awaitTermination(120)

    second.coalesce(1).write.parquet(str(src / "batch_b"))
    stream2 = events_stream(spark, f"{src}/*")
    ingest_events_to_corpus(stream2, corpus, ckpt).start().awaitTermination(120)

    got = spark.read.parquet(corpus)
    assert got.count() == 150  # no duplicates despite the 50-row overlap
    assert got.select("event_id").distinct().count() == 150


def test_apply_in_pandas_with_state_accumulates(spark, tmp_path):
    # custom stateful operator: per-user running totals must survive
    # across separate availableNow runs via the checkpointed state store
    from pyspark.sql import functions as F

    from multimodal_vector_db_spark.streaming.ingest import running_user_totals

    src = tmp_path / "state_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_state")
    out_dir = str(tmp_path / "state_out")

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").orderBy("event_id")
    first, second = ev.limit(200), ev.where(
        (F.col("event_id") >= 200) & (F.col("event_id") < 400)
    )
    first.coalesce(1).write.parquet(str(src / "b0"))

    def run():
        stream = running_user_totals(events_stream(spark, f"{src}/*"))
        (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    run()
    second.coalesce(1).write.parquet(str(src / "b1"))
    run()

    # the LAST emitted row per user reflects the accumulated state
    from pyspark.sql import Window

    emitted = spark.read.parquet(out_dir)
    latest = (
        emitted.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
            ),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    expected = (
        first.unionByName(second)
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in latest.collect()}
    want = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in expected.collect()}
    assert got == want


def test_watermark_drops_late_data(spark, tmp_path):
    # late-data semantics: events older than (max_ts - watermark) that
    # arrive in a LATER micro-batch must be dropped from the windowed
    # aggregation state, not merged
    from pyspark.sql import functions as F

    src_dir = tmp_path / "late_src"
    src_dir.mkdir()
    ckpt = str(tmp_path / "ckpt_late")
    out_dir = str(tmp_path / "late_out")

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    bounds = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    lo, hi = bounds["lo"], bounds["hi"]
    mid = lo + (hi - lo) // 2
    early, late_half = ev.where(F.col("ts") < mid), ev.where(F.col("ts") >= mid)

    def run():
        stream = windowed_counts(
            events_stream(spark, f"{src_dir}/*"),
            window_duration="1 hour",
            watermark="2 hours",
        )
        (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")  # append emits only watermark-closed windows
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    # batch 0: the NEWER half arrives first (advances the watermark far
    # past the older half); batch 1: the OLD half arrives late
    late_half.coalesce(1).write.parquet(str(src_dir / "b0"))
    run()
    early.coalesce(1).write.parquet(str(src_dir / "b1"))
    run()

    emitted = spark.read.parquet(out_dir)
    total_emitted = emitted.agg(
        F.coalesce(F.sum("n_events"), F.lit(0))
    ).first()[0]
    # if late data were NOT dropped, every event would eventually be
    # emitted; with the watermark, the old half's contribution is gone
    assert total_emitted < ev.count() - early.count() * 0.5


def test_stream_interval_join_matches_batch(spark, tmp_path):
    from multimodal_vector_db_spark.streaming import (
        events_stream,
        interval_join,
    )

    src = _stage_events(spark, tmp_path)
    batch_events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    bviews = batch_events.where(F.col("event_type") == "view")
    bpurch = batch_events.where(F.col("event_type") == "purchase")
    want = {
        (r["left_id"], r["right_id"])
        for r in interval_join(bviews, bpurch, gap_seconds=3600).collect()
    }

    s = events_stream(spark, src)
    joined = interval_join(
        s.where(F.col("event_type") == "view"),
        s.where(F.col("event_type") == "purchase"),
        gap_seconds=3600,
    )
    run_available_now(
        joined,
        str(tmp_path / "ckpt_ij"),
        query_name="ij_test",
        output_mode="append",
    )
    got = {
        (r["left_id"], r["right_id"])
        for r in spark.sql("SELECT * FROM ij_test").collect()
    }
    assert got == want and len(want) > 0


def test_stream_dedup_within_watermark(spark, tmp_path):
    import shutil as _sh

    from multimodal_vector_db_spark.streaming import (
        dedup_within_watermark,
        events_stream,
    )

    # stage the SAME file twice -> every event_id arrives twice
    src = tmp_path / "events_dup"
    src.mkdir()
    _sh.copy(f"{SF_DIR}/events.parquet", src / "part-000.parquet")
    _sh.copy(f"{SF_DIR}/events.parquet", src / "part-001.parquet")

    deduped = dedup_within_watermark(events_stream(spark, str(src)))
    run_available_now(
        deduped,
        str(tmp_path / "ckpt_dd"),
        query_name="dd_test",
        output_mode="append",
    )
    got = spark.sql("SELECT event_id FROM dd_test").collect()
    n_unique = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id")
        .distinct()
        .count()
    )
    assert len(got) == len({r["event_id"] for r in got}) == n_unique


def test_stream_static_enrichment_join_matches_batch(spark, tmp_path):
    # stream-static join: the event stream enriched by a static
    # dimension (broadcast per micro-batch, no stream-side state) —
    # the standard serving-side enrichment shape
    src = _stage_events(spark, tmp_path)
    cust = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )

    def enriched_counts(events):
        return (
            events.join(F.broadcast(cust), "user_id")
            .groupBy("segment", "event_type")
            .agg(F.count("*").cast("long").alias("n"))
        )

    stream = enriched_counts(events_stream(spark, src))
    run_available_now(
        stream,
        str(tmp_path / "ckpt_enrich"),
        query_name="enrich_test",
        output_mode="complete",
    )
    got = {
        (r["segment"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM enrich_test").collect()
    }
    want = {
        (r["segment"], r["event_type"]): r["n"]
        for r in enriched_counts(
            spark.read.parquet(f"{SF_DIR}/events.parquet")
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_knn_serving_equals_batch(spark, tmp_path):
    """Queries served over a stream (two availableNow drains, second
    replays an overlapping file) must produce exactly the batch
    knn_join answers, once per query."""
    from pyspark.sql import functions as F

    from multimodal_vector_db_spark.operators.knn import knn_join
    from multimodal_vector_db_spark.streaming import serve_knn_queries

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = emb.select(F.col("vec_id").alias("id"), "embedding")
    qs = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )

    src = tmp_path / "query_stream"
    src.mkdir()
    qs.where(F.col("query_id") < 5).coalesce(1).write.parquet(
        str(src / "batch_a")
    )
    results = str(tmp_path / "knn_results")
    ckpt = str(tmp_path / "ckpt_knn")
    schema = "query_id long, q_emb array<float>"

    stream = spark.readStream.schema(schema).parquet(f"{src}/*")
    serve_knn_queries(
        stream, corpus, k=3, results_path=results, checkpoint_dir=ckpt
    ).start().awaitTermination(120)

    # second file overlaps queries 3-4 (replay) and adds 5-7
    qs.where(F.col("query_id") >= 3).coalesce(1).write.parquet(
        str(src / "batch_b")
    )
    stream2 = spark.readStream.schema(schema).parquet(f"{src}/*")
    serve_knn_queries(
        stream2, corpus, k=3, results_path=results, checkpoint_dir=ckpt
    ).start().awaitTermination(120)

    got = {
        (r["query_id"], r["id"], r["rank"])
        for r in spark.read.parquet(results).collect()
    }
    want = {
        (r["query_id"], r["id"], r["rank"])
        for r in knn_join(corpus, qs, k=3).collect()
    }
    assert got == want
    assert spark.read.parquet(results).count() == 8 * 3  # once per query


def test_corpus_refresh_stream_drops_cross_batch_duplicate(spark, tmp_path):
    """Two microbatches through the streaming corpus refresh: batch B
    contains a near-duplicate of a batch-A doc (never of anything in
    its own batch) — it must be dropped because batch A's signatures
    were appended to the persisted band index. Novel docs survive, the
    index grows by exactly the survivors' bands, and history text is
    never re-read (the corpus path is write-only here)."""
    from multimodal_vector_db_spark.streaming import corpus_refresh_stream

    src = tmp_path / "docs_src"
    src.mkdir()
    corpus = str(tmp_path / "refresh_corpus")
    index = str(tmp_path / "refresh_index")
    ckpt = str(tmp_path / "ckpt_refresh")

    dup_text = "the quick brown fox jumps over the lazy dog tonight"
    batch_a = spark.createDataFrame(
        [(1, dup_text),
         (2, "completely different first-batch content about ships")],
        "doc_id long, text string",
    )
    batch_b = spark.createDataFrame(
        [(10, dup_text),  # cross-batch near-dup of doc 1 -> dropped
         (11, "genuinely novel second-batch content about planets")],
        "doc_id long, text string",
    )
    schema = "doc_id long, text string"

    batch_a.coalesce(1).write.parquet(str(src / "batch_a"))
    stream = spark.readStream.schema(schema).parquet(f"{src}/*")
    corpus_refresh_stream(
        stream, corpus, index, ckpt
    ).start().awaitTermination(120)

    batch_b.coalesce(1).write.parquet(str(src / "batch_b"))
    stream2 = spark.readStream.schema(schema).parquet(f"{src}/*")
    corpus_refresh_stream(
        stream2, corpus, index, ckpt
    ).start().awaitTermination(120)

    got = spark.read.parquet(corpus)
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 2, 11]
    idx = spark.read.parquet(index)
    # 3 surviving docs x 4 bands
    assert idx.count() == 12
    assert set(idx.columns) == {"band_key", "doc_id", "sig"}
    assert sorted(
        r["doc_id"] for r in idx.select("doc_id").distinct().collect()
    ) == [1, 2, 11]


def _p5(pixels):
    """Real binary P5 netpbm bytes for a 7x9 uint8 grid."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    assert arr.shape == (7, 9)
    return b"P5\n9 7\n255\n" + arr.tobytes()


def test_media_refresh_stream_drops_cross_batch_image_dup(spark, tmp_path):
    """Two microbatches of REAL binary P5 images through the streaming
    media refresh: batch B contains a near-duplicate (one pixel
    changed, exactly one dHash bit flipped) of a batch-A image — it
    must be dropped because batch A's band slices were appended to the
    persisted fingerprint index. Novel images survive, the index grows
    by exactly the survivors' bands, and historical media bytes are
    never re-read or re-decoded (the corpus path is write-only here)."""
    import numpy as np

    from multimodal_vector_db_spark.multimodal.phash import dhash56
    from multimodal_vector_db_spark.streaming import media_refresh_stream

    src = tmp_path / "img_src"
    src.mkdir()
    corpus = str(tmp_path / "img_corpus")
    index = str(tmp_path / "img_index")
    ckpt = str(tmp_path / "img_ckpt")

    base = np.tile(np.arange(9, dtype=np.uint8) * 10, (7, 1))
    near = base.copy()
    near[0, 1] = 0  # flips exactly one comparison bit
    assert bin(dhash56(base) ^ dhash56(near)).count("1") == 1
    rng = np.random.default_rng(13)
    novel_a = rng.integers(0, 256, (7, 9), dtype=np.uint8)
    novel_b = rng.integers(0, 256, (7, 9), dtype=np.uint8)
    assert bin(dhash56(base) ^ dhash56(novel_b)).count("1") > 1
    assert bin(dhash56(novel_a) ^ dhash56(novel_b)).count("1") > 1

    schema = "doc_id long, content binary"
    batch_a = spark.createDataFrame(
        [(1, _p5(base)), (2, _p5(novel_a))], schema
    )
    batch_b = spark.createDataFrame(
        [(10, _p5(near)),  # cross-batch near-dup of doc 1 -> dropped
         (11, _p5(novel_b))],
        schema,
    )

    batch_a.coalesce(1).write.parquet(str(src / "batch_a"))
    stream = spark.readStream.schema(schema).parquet(f"{src}/*")
    media_refresh_stream(
        stream, corpus, index, ckpt, modality="image"
    ).start().awaitTermination(120)

    batch_b.coalesce(1).write.parquet(str(src / "batch_b"))
    stream2 = spark.readStream.schema(schema).parquet(f"{src}/*")
    media_refresh_stream(
        stream2, corpus, index, ckpt, modality="image"
    ).start().awaitTermination(120)

    got = spark.read.parquet(corpus)
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 2, 11]
    idx = spark.read.parquet(index)
    # 3 surviving images x 4 bands in the band_slices layout
    assert idx.count() == 12
    # round 8: fresh sinks carry the batch_id replay-partition column
    assert set(idx.columns) == {"id", "h", "band_k", "band_v", "batch_id"}
    assert sorted(
        r["id"] for r in idx.select("id").distinct().collect()
    ) == [1, 2, 11]
    # survivors' stored hashes match an independent recompute
    stored = {r["id"]: r["h"] for r in idx.select("id", "h").collect()}
    assert stored == {
        1: dhash56(base), 2: dhash56(novel_a), 11: dhash56(novel_b)
    }


def test_media_refresh_stream_audio_and_video(spark, tmp_path):
    """The audio and video modality recipes run the same loop: a
    cross-batch identical clip is dropped against the persisted
    fingerprint index; a novel clip survives."""
    import numpy as np

    from multimodal_vector_db_spark.multimodal.codecs import (
        encode_wav,
        encode_y4m,
    )
    from multimodal_vector_db_spark.streaming import media_refresh_stream


    def wav(seed):
        r = np.random.default_rng(seed)
        x = (r.standard_normal(64) * 0.3).clip(-1, 1)
        return encode_wav((x * 32767).astype(np.int16), 8000)

    def y4m(seed):
        r = np.random.default_rng(seed)
        return encode_y4m(
            r.integers(0, 256, (4, 4, 4), dtype=np.uint8)
        )

    for modality, mk in (("audio", wav), ("video", y4m)):
        src = tmp_path / f"{modality}_src"
        src.mkdir()
        corpus = str(tmp_path / f"{modality}_corpus")
        index = str(tmp_path / f"{modality}_index")
        ckpt = str(tmp_path / f"{modality}_ckpt")
        schema = "doc_id long, content binary"

        spark.createDataFrame(
            [(1, mk(100)), (2, mk(200))], schema
        ).coalesce(1).write.parquet(str(src / "a"))
        media_refresh_stream(
            spark.readStream.schema(schema).parquet(f"{src}/*"),
            corpus, index, ckpt, modality=modality,
        ).start().awaitTermination(120)

        spark.createDataFrame(
            [(10, mk(100)), (11, mk(300))], schema  # 10 dups batch-A's 1
        ).coalesce(1).write.parquet(str(src / "b"))
        media_refresh_stream(
            spark.readStream.schema(schema).parquet(f"{src}/*"),
            corpus, index, ckpt, modality=modality,
        ).start().awaitTermination(120)

        survivors = sorted(
            r["doc_id"] for r in spark.read.parquet(corpus).collect()
        )
        assert survivors == [1, 2, 11], modality
        # 3 survivors x 2 bands (15-bit contour fingerprints)
        assert spark.read.parquet(index).count() == 6, modality


def test_media_refresh_replay_is_idempotent(spark, tmp_path):
    """Crash-recovery contract: replaying a microbatch that already
    completed BOTH appends (corpus + fingerprint index) admits nothing
    — each replayed image matches its own stored fingerprint at
    Hamming 0 and is dropped. Simulated with a fresh checkpoint over
    the same source file (the at-least-once worst case)."""
    import numpy as np

    from multimodal_vector_db_spark.streaming import media_refresh_stream

    src = tmp_path / "replay_src"
    src.mkdir()
    corpus = str(tmp_path / "replay_corpus")
    index = str(tmp_path / "replay_index")

    rng = np.random.default_rng(41)
    schema = "doc_id long, content binary"
    imgs = [
        (i, _p5(rng.integers(0, 256, (7, 9), dtype=np.uint8)))
        for i in range(3)
    ]
    spark.createDataFrame(imgs, schema).coalesce(1).write.parquet(
        str(src / "batch")
    )

    media_refresh_stream(
        spark.readStream.schema(schema).parquet(f"{src}/*"),
        corpus, index, str(tmp_path / "ckpt1"), modality="image",
    ).start().awaitTermination(120)
    assert spark.read.parquet(corpus).count() == 3
    assert spark.read.parquet(index).count() == 12

    # replay: new checkpoint, same file — everything must be dropped
    media_refresh_stream(
        spark.readStream.schema(schema).parquet(f"{src}/*"),
        corpus, index, str(tmp_path / "ckpt2"), modality="image",
    ).start().awaitTermination(120)
    assert spark.read.parquet(corpus).count() == 3
    assert spark.read.parquet(index).count() == 12


def test_media_refresh_replay_idempotent_in_crash_window(spark, tmp_path):
    """The OTHER crash window: a batch that appended to the corpus but
    died BEFORE the index append replays with its fingerprints absent
    from the index — the per-sink anti-joins must (a) write no
    duplicate corpus row (ids already in the corpus) and (b) HEAL the
    index by writing the fingerprints the crash dropped (ids not yet
    in the index). Simulated by seeding the corpus with the batch's
    rows while leaving the index missing."""
    import numpy as np

    from multimodal_vector_db_spark.streaming import media_refresh_stream

    src = tmp_path / "cw_src"
    src.mkdir()
    corpus = str(tmp_path / "cw_corpus")
    index = str(tmp_path / "cw_index")

    rng = np.random.default_rng(43)
    schema = "doc_id long, content binary"
    imgs = [
        (i, _p5(rng.integers(0, 256, (7, 9), dtype=np.uint8)))
        for i in range(3)
    ]
    batch = spark.createDataFrame(imgs, schema)
    batch.coalesce(1).write.parquet(str(src / "batch"))
    # crash-window state: corpus append completed, index append did not
    batch.write.mode("append").parquet(corpus)

    media_refresh_stream(
        spark.readStream.schema(schema).parquet(f"{src}/*"),
        corpus, index, str(tmp_path / "cw_ckpt"), modality="image",
    ).start().awaitTermination(120)
    got = spark.read.parquet(corpus)
    assert got.count() == 3  # no duplicate corpus rows re-admitted
    assert sorted(r["doc_id"] for r in got.collect()) == [0, 1, 2]
    # ... and the replay healed the index: the 3 docs' 4 band slices
    # each landed exactly once, so future near-dups of them are caught
    idx = spark.read.parquet(index)
    assert idx.count() == 12
    assert sorted(
        r["id"] for r in idx.select("id").distinct().collect()
    ) == [0, 1, 2]


def test_vector_refresh_stream_dedups_and_assigns_cells(spark, tmp_path):
    """The IVF twin of the media refresh (round-7): two microbatches of
    vectors against a PERSISTED cell-partitioned index — a cross-batch
    semantic near-dup is dropped, a near-dup of pre-built history is
    dropped, novel vectors land in the same cells the batch operator
    assigns, and replay admits nothing."""
    import numpy as np

    from multimodal_vector_db_spark.operators.ann import (
        build_ivf_index,
        ivf_assign,
    )
    from multimodal_vector_db_spark.streaming import vector_refresh_stream

    rng = np.random.default_rng(29)

    def unit(v):
        v = np.asarray(v, dtype=np.float64)
        return [float(x) for x in v / np.linalg.norm(v)]

    d = 8
    hist_vecs = [unit(rng.standard_normal(d)) for _ in range(6)]
    hist = spark.createDataFrame(
        [(i, v) for i, v in enumerate(hist_vecs)],
        "id long, embedding array<double>",
    )
    index = str(tmp_path / "ivf_index")
    centroids = build_ivf_index(hist, index, n_clusters=2, seed=7)

    novel_a = unit(rng.standard_normal(d))
    near_hist = unit(np.asarray(hist_vecs[0]) + 0.01 * rng.standard_normal(d))
    novel_b = unit(rng.standard_normal(d))
    near_a = unit(np.asarray(novel_a) + 0.01 * rng.standard_normal(d))

    src = tmp_path / "vec_src"
    src.mkdir()
    schema = "id long, embedding array<double>"
    spark.createDataFrame(
        [(100, novel_a), (101, near_hist)], schema
    ).coalesce(1).write.parquet(str(src / "a"))
    vector_refresh_stream(
        spark.readStream.schema(schema).parquet(f"{src}/*"),
        index, str(tmp_path / "ck1"), threshold=0.95,
    ).start().awaitTermination(120)

    got1 = {r["id"] for r in spark.read.parquet(index).select("id").collect()}
    assert got1 == {0, 1, 2, 3, 4, 5, 100}  # 101 ~ history vec 0 dropped

    spark.createDataFrame(
        [(200, near_a), (201, novel_b)], schema
    ).coalesce(1).write.parquet(str(src / "b"))
    vector_refresh_stream(
        spark.readStream.schema(schema).parquet(f"{src}/*"),
        index, str(tmp_path / "ck2"), threshold=0.95,
    ).start().awaitTermination(120)

    idx = spark.read.parquet(index)
    got2 = {r["id"] for r in idx.select("id").collect()}
    # 200 ~ batch-A's 100 (cross-batch, via the persisted index);
    # replay of batch A under the fresh checkpoint admitted nothing
    assert got2 == {0, 1, 2, 3, 4, 5, 100, 201}

    # streamed cell assignment == the batch operator's assignment
    # under the BUILD rule (build_ivf_index = MLlib KMeans = min-L2;
    # the stream's default metric must agree — a max-dot default would
    # drift cells because KMeans centroids have unequal norms)
    streamed = {
        r["id"]: r["cluster_id"]
        for r in idx.where(F.col("id") >= 100).collect()
    }
    want = {
        r["id"]: r["cluster_id"]
        for r in ivf_assign(
            spark.createDataFrame(
                [(100, novel_a), (201, novel_b)], schema
            ),
            centroids,
            metric="l2",
        ).collect()
    }
    assert streamed == want

    # nprobe partition layout: cell dirs exist on disk
    import os

    assert any(
        e.startswith("cluster_id=") for e in os.listdir(index)
    )


def test_uncommitted_sink_reads_as_empty_not_wedged(spark, tmp_path):
    """A crash during the very FIRST sink write leaves a bare directory
    (no committed parquet). The replay guards must treat that as 'no
    history yet' — with a plain existence check the stream would wedge
    forever (exists → read fails → retry hits the same state). Real
    sinks still propagate read failures for checkpoint retry."""
    import os

    import pytest

    from multimodal_vector_db_spark.streaming.ingest import (
        _read_parquet_if_any,
    )

    bare = tmp_path / "bare_sink"
    bare.mkdir()
    (bare / "_temporary").mkdir()  # what an interrupted write leaves
    assert _read_parquet_if_any(spark, str(bare)) is None
    assert _read_parquet_if_any(spark, str(tmp_path / "absent")) is None

    # a sink with committed data reads normally
    real = str(tmp_path / "real_sink")
    spark.range(3).write.parquet(real)
    got = _read_parquet_if_any(spark, real)
    assert got is not None and got.count() == 3

    # ...and a CORRUPT committed file still fails the batch (retry),
    # never silently reads as empty
    corrupt = tmp_path / "corrupt_sink"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_bytes(b"not parquet at all")
    try:
        df = _read_parquet_if_any(spark, str(corrupt))
    except Exception:
        df = "raised"  # raising at read time is also acceptable
    # the one FORBIDDEN outcome is silently reading as empty (None):
    # that would skip dedup and re-admit the whole batch
    assert df is not None
    if df != "raised":
        with pytest.raises(Exception):
            df.count()  # corrupt footer must surface, not hide

    # end-to-end: ingest into a pre-existing BARE corpus dir works
    src = tmp_path / "src"
    src.mkdir()
    corpus = tmp_path / "wedge_corpus"
    corpus.mkdir()  # simulate the crash-before-commit state
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(10)
    ev.coalesce(1).write.parquet(str(src / "b0"))
    from multimodal_vector_db_spark.streaming import (
        events_stream,
        ingest_events_to_corpus,
    )

    ingest_events_to_corpus(
        events_stream(spark, f"{src}/*"),
        str(corpus),
        str(tmp_path / "ck"),
    ).start().awaitTermination(120)
    assert spark.read.parquet(str(corpus)).count() == 10
    assert os.path.isdir(str(corpus))


def test_vector_refresh_batch_id_overwrite_replay(spark, tmp_path):
    """Round-8 replay tier: with build_ivf_index(batch_id_layout=True)
    the stream owns cluster_id=*/batch_id=N partitions — a replayed
    batch (fresh checkpoint, same files) is a no-op, a crash-window
    partial append is cleared and rewritten, and no index-wide id scan
    exists (the history read is partition-pruned; plan-asserted)."""
    import contextlib
    import io
    import os
    import re

    import numpy as np

    from multimodal_vector_db_spark.operators.ann import build_ivf_index
    from multimodal_vector_db_spark.streaming import vector_refresh_stream

    rng = np.random.default_rng(31)

    def unit(v):
        v = np.asarray(v, dtype=np.float64)
        return [float(x) for x in v / np.linalg.norm(v)]

    d = 8
    hist = spark.createDataFrame(
        [(i, unit(rng.standard_normal(d))) for i in range(6)],
        "id long, embedding array<double>",
    )
    index = str(tmp_path / "ivf_bid")
    build_ivf_index(hist, index, n_clusters=2, seed=7, batch_id_layout=True)
    built = spark.read.parquet(index)
    assert "batch_id" in built.columns and built.count() == 6

    novel = [(100 + i, unit(rng.standard_normal(d))) for i in range(4)]
    src = tmp_path / "vb_src"
    src.mkdir()
    schema = "id long, embedding array<double>"
    spark.createDataFrame(novel, schema).coalesce(1).write.parquet(
        str(src / "a")
    )
    vector_refresh_stream(
        spark.readStream.schema(schema).parquet(f"{src}/*"),
        index, str(tmp_path / "vb_ck1"), threshold=0.95,
    ).start().awaitTermination(120)
    after1 = spark.read.parquet(index)
    assert after1.count() == 10
    # streamed rows landed under batch_id=0 INSIDE the cluster dirs
    # (cluster_id stays outer -> nprobe pruning untouched)
    cells = [e for e in os.listdir(index) if e.startswith("cluster_id=")]
    assert any(
        "batch_id=0" in os.listdir(os.path.join(index, c)) for c in cells
    )

    # REPLAY (fresh checkpoint, same source): recompute + overwrite own
    # partitions -> idempotent, still 10 rows, no index-wide scan run
    vector_refresh_stream(
        spark.readStream.schema(schema).parquet(f"{src}/*"),
        index, str(tmp_path / "vb_ck2"), threshold=0.95,
    ).start().awaitTermination(120)
    after2 = spark.read.parquet(index)
    assert after2.count() == 10
    assert sorted(
        r["id"] for r in after2.where("batch_id = 0").collect()
    ) == [100, 101, 102, 103]

    # crash-window shape: a partial batch_id=0 dir with a WRONG extra
    # row gets cleared by the next replay, not merged
    stray_cell = cells[0]
    spark.createDataFrame(
        [(999, novel[0][1])], schema
    ).coalesce(1).write.mode("append").parquet(
        os.path.join(index, stray_cell, "batch_id=0")
    )
    assert spark.read.parquet(index).count() == 11
    vector_refresh_stream(
        spark.readStream.schema(schema).parquet(f"{src}/*"),
        index, str(tmp_path / "vb_ck3"), threshold=0.95,
    ).start().awaitTermination(120)
    after3 = spark.read.parquet(index)
    assert after3.count() == 10
    assert 999 not in {r["id"] for r in after3.collect()}

    # plan assertion: the history read excluding the batch's own
    # partitions is PARTITION pruning (batch_id in PartitionFilters),
    # i.e. the guard costs file listing, not an index-wide id scan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        spark.read.parquet(index).where("batch_id != 0").explain(
            "formatted"
        )
    p = buf.getvalue()
    assert re.search(r"PartitionFilters: \[[^\]]*batch_id[^\]]*\]", p), p


def test_media_refresh_fresh_sinks_use_batch_id_layout(spark, tmp_path):
    """Fresh media-refresh sinks are created batch_id-partitioned; a
    later microbatch under the SAME checkpoint still drops cross-batch
    near-dups, and a crashed attempt's partial partition (pre-seeded
    stray rows under the upcoming batch's own batch_id) is CLEARED and
    rewritten by the partition-overwrite replay tier — no id anti-join
    anywhere."""
    import numpy as np

    from multimodal_vector_db_spark.multimodal.phash import dhash56
    from multimodal_vector_db_spark.streaming import media_refresh_stream

    rng = np.random.default_rng(33)
    corpus = str(tmp_path / "mb_corpus")
    index = str(tmp_path / "mb_index")
    ckpt = str(tmp_path / "mb_ck")  # ONE checkpoint — the replay key
    src = tmp_path / "mb_src"
    src.mkdir()
    schema = "doc_id long, content binary"

    base = np.tile(np.arange(9, dtype=np.uint8) * 10, (7, 1))
    near = base.copy()
    near[0, 1] = 0  # flips exactly one dHash comparison bit
    assert bin(dhash56(base) ^ dhash56(near)).count("1") == 1
    other = rng.integers(0, 256, (7, 9), dtype=np.uint8)
    assert bin(dhash56(base) ^ dhash56(other)).count("1") > 1

    spark.createDataFrame(
        [(0, _p5(base)), (1, _p5(other))], schema
    ).coalesce(1).write.parquet(str(src / "a"))
    media_refresh_stream(
        spark.readStream.schema(schema).parquet(f"{src}/*"),
        corpus, index, ckpt, modality="image",
    ).start().awaitTermination(120)
    got = spark.read.parquet(corpus)
    assert "batch_id" in got.columns and got.count() == 2
    assert "batch_id" in spark.read.parquet(index).columns

    # crash-window simulation: a crashed batch-1 attempt left partial
    # stray rows in BOTH sinks under batch_id=1 before the commit
    import os

    spark.createDataFrame([(999, _p5(other))], schema).coalesce(
        1
    ).write.mode("append").parquet(os.path.join(corpus, "batch_id=1"))
    assert spark.read.parquet(corpus).count() == 3

    # batch 1 (same checkpoint): a near-dup of doc 0 -> dropped via the
    # persisted index; a novel doc survives; the stray partial is gone
    spark.createDataFrame(
        [(2, _p5(near)), (3, _p5(rng.integers(0, 256, (7, 9), dtype=np.uint8)))],
        schema,
    ).coalesce(1).write.parquet(str(src / "b"))
    media_refresh_stream(
        spark.readStream.schema(schema).parquet(f"{src}/*"),
        corpus, index, ckpt, modality="image",
    ).start().awaitTermination(120)
    final = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert final == [0, 1, 3], final  # 2 deduped, 999 cleared
    idx = spark.read.parquet(index)
    assert sorted(
        r["id"] for r in idx.select("id").distinct().collect()
    ) == [0, 1, 3]


def test_run_available_now_progress_out_carries_state_metrics(
    spark, tmp_path
):
    """Round 12: the streaming profiler's state-cardinality octave
    reads state-store rows/bytes from the progress log — pin the
    ``progress_out`` hook: a stateful drain must surface at least one
    progress event whose stateOperators carry numRowsTotal matching
    the distinct (window, event_type) key count."""
    src = _stage_events(spark, tmp_path)
    stream = windowed_counts(events_stream(spark, src))
    progress: list = []
    run_available_now(
        stream,
        str(tmp_path / "ckpt_prog"),
        query_name="prog_test",
        output_mode="complete",
        progress_out=progress,
    )
    ops = [p["stateOperators"][0] for p in progress if p.get("stateOperators")]
    assert ops, "no stateOperators in any progress event"
    n_keys = (
        windowed_counts(spark.read.parquet(f"{SF_DIR}/events.parquet"))
        .count()
    )
    assert ops[-1]["numRowsTotal"] == n_keys
    assert ops[-1]["memoryUsedBytes"] > 0
