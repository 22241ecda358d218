"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` but every setting is chosen to also be
the right default on a large cluster:

- AQE on (runtime coalesce + skew-join handling) — at 100 TB the static
  shuffle-partition count is always wrong somewhere; AQE fixes it per stage.
- Arrow on with a bounded batch size — all Python UDF traffic is
  Arrow-vectorized (the reference's batched model inference,
  ``base_embedder.py:239-255``, maps to this knob).
- UTC session timezone — deterministic timestamp semantics (and parity
  with the DuckDB oracle, which is UTC-naive).
- shuffle partitions sized to cores locally; on a real cluster AQE
  coalesces from an intentionally-high initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "multimodal_vector_db_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # Broadcast threshold: query sides / dimension tables / codebooks
        # are broadcast; the corpus never is.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as LONG nanos and convert explicitly.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local mode: the driver JVM IS the executor — size it for 32
        # concurrent task threads (expression-heavy operators generate
        # real garbage; a small heap turns long sessions GC-bound)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
