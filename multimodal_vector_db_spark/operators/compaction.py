"""Small-file compaction: the standing maintenance job of a 100 TB
parquet warehouse.

Streaming ingest and fine-grained upserts leave directories with
thousands of KB-sized files; every query then pays per-file open +
footer-parse + task-schedule overhead (and the NameNode/object-store
pays the listing). Compaction rewrites a directory into ~target-sized
files while PRESERVING the existing sort order within each rewritten
group (rewriting with a global shuffle would destroy a Z-order/sort
layout and its min-max pruning).

Planning is driver-side over the file *listing* only (names + sizes —
never the data): greedy first-fit by cumulative size, the same
bin-packing every lakehouse table format ships. The rewrite itself is
distributed — each bin is a narrow read→write with no shuffle
(`coalesce(1)` per bin caps each output file at ~target_bytes).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class CompactionPlan:
    #: bins[i] = list of input file paths rewritten into output file i
    bins: list[list[str]]
    #: files left untouched (already >= target_bytes * keep_ratio)
    skipped: list[str]


def plan_compaction(
    sizes: dict[str, int],
    target_bytes: int,
    keep_ratio: float = 0.8,
) -> CompactionPlan:
    """Greedy first-fit-decreasing bin-packing of small files into
    ~``target_bytes`` bins. Files already at ``keep_ratio * target``
    or larger are left in place (rewriting them buys nothing). A bin
    holding a single small file whose directory has no sibling to merge
    with is still rewritten only if the directory gains from it — i.e.
    singleton bins are skipped too."""
    small = sorted(
        (p for p, b in sizes.items() if b < target_bytes * keep_ratio),
        key=lambda p: (-sizes[p], p),
    )
    skipped = [p for p in sizes if sizes[p] >= target_bytes * keep_ratio]
    bins: list[list[str]] = []
    fill: list[int] = []
    for p in small:
        b = sizes[p]
        placed = False
        for i in range(len(bins)):
            if fill[i] + b <= target_bytes:
                bins[i].append(p)
                fill[i] += b
                placed = True
                break
        if not placed:
            bins.append([p])
            fill.append(b)
    # a singleton bin is a no-op rewrite — keep the file as is
    singletons = [b[0] for b in bins if len(b) == 1]
    skipped.extend(singletons)
    bins = [b for b in bins if len(b) > 1]
    return CompactionPlan(bins=bins, skipped=skipped)


def list_parquet_files(path: str) -> dict[str, int]:
    """Local-FS file listing (path → bytes). On a real cluster swap in
    the Hadoop FileSystem listing; only names and sizes are needed, so
    the planner never touches data."""
    out: dict[str, int] = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                full = os.path.join(root, f)
                out[full] = os.path.getsize(full)
    return out


def compact_directory(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    stats_cols: list[str] | None = None,
) -> CompactionPlan:
    """Rewrite ``src_dir`` into ``dest_dir`` with small files merged to
    ~``target_bytes``. Each bin reads only its member files and writes
    one output file (``coalesce(1)`` — a narrow, shuffle-free plan);
    skipped files are copied through by reference (read+write without
    merging, preserving their row order). Non-destructive: the source
    directory is untouched, so the swap (atomic rename / metadata
    commit on a real table format) stays with the caller.

    ``stats_cols``: compaction INVALIDATES any per-file zone-map table
    built over the source layout (the files it names are gone); passing
    the zone-map columns here rebuilds the stats table over the
    compacted files (written to ``<dest_dir>.stats.parquet``) in the
    same pass, keeping data skipping correct after maintenance."""
    plan = plan_compaction(list_parquet_files(src_dir), target_bytes)
    os.makedirs(dest_dir, exist_ok=True)
    # mergeSchema: files within a bin may carry evolved schemas (columns
    # added over time); without it Spark infers from one file and
    # silently drops the others' extra columns — lossy "compaction".
    for i, group in enumerate(plan.bins):
        (
            spark.read.option("mergeSchema", "true")
            .parquet(*group)
            .coalesce(1)
            .write.mode("append")
            .parquet(dest_dir)
        )
    for p in plan.skipped:
        spark.read.option("mergeSchema", "true").parquet(p).coalesce(
            1
        ).write.mode("append").parquet(dest_dir)
    if stats_cols:
        from multimodal_vector_db_spark.operators.pruning import (
            build_stats_table,
        )

        build_stats_table(spark, dest_dir, stats_cols).coalesce(
            1
        ).write.mode("overwrite").parquet(dest_dir + ".stats.parquet")
    return plan
