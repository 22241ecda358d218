"""Structured Streaming extension (SURVEY §2.11, §7 phase 7).

The reference has no streaming at all — its only incremental behavior
is append-only ``add_vectors`` with a monotonic id
(``vector_index.py:94-103``). This package is the scale-out analogue:
file-source ingest → watermarked windowed aggregation → ``foreachBatch``
dedup-upsert into the partitioned corpus table.
"""

from multimodal_vector_db_spark.streaming.ingest import (
    EVENTS_SCHEMA,
    corpus_refresh_stream,
    dedup_within_watermark,
    events_stream,
    ingest_events_to_corpus,
    interval_join,
    media_refresh_stream,
    run_available_now,
    serve_knn_queries,
    session_windowed_counts,
    vector_refresh_stream,
    windowed_counts,
)

__all__ = [
    "EVENTS_SCHEMA",
    "corpus_refresh_stream",
    "dedup_within_watermark",
    "events_stream",
    "ingest_events_to_corpus",
    "interval_join",
    "media_refresh_stream",
    "run_available_now",
    "serve_knn_queries",
    "session_windowed_counts",
    "vector_refresh_stream",
    "windowed_counts",
]
