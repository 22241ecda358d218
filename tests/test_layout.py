"""Z-order layout: each written file must cover a small rectangle of
the key space, and min-max stats must prune files on EITHER column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from multimodal_vector_db_spark.functions.layout import (
    morton_code,
    zorder_repartition,
)

# 16 = 4^2 files → the ideal layout is a 4x4 tile grid, so a point
# predicate on one column intersects ~4 tiles; 8 files would sit at
# exactly N/2 ideal and any range-boundary straddle flakes the bound.
N_FILES = 16


def _file_ranges(path: str, cols: tuple[str, str]):
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    lo[name] = st.min if lo[name] is None else min(lo[name], st.min)
                    hi[name] = st.max if hi[name] is None else max(hi[name], st.max)
        out.append((lo, hi))
    return out


def test_zorder_files_are_tiles_and_prune(spark, lineitem, tmp_path):
    cols = ("l_partkey", "l_suppkey")
    dest = str(tmp_path / "zordered")
    zorder_repartition(
        lineitem.select(*cols), *cols, n_files=N_FILES
    ).write.parquet(dest)

    ranges = _file_ranges(dest, cols)
    assert len(ranges) == N_FILES

    g = lineitem.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    global_area = (g[1] - g[0] + 1) * (g[3] - g[2] + 1)
    avg_area = sum(
        (hi["l_partkey"] - lo["l_partkey"] + 1)
        * (hi["l_suppkey"] - lo["l_suppkey"] + 1)
        for lo, hi in ranges
    ) / len(ranges)
    # Z-order: files are rectangles ~1/N_FILES of the space; a plain
    # sort by l_partkey would leave every file spanning the FULL
    # l_suppkey range (avg_area ~ global_area / N_FILES on one axis
    # only). Require a real 2-D win.
    assert avg_area < global_area / 3

    # point-predicate pruning on EACH column: the probe value must fall
    # outside most files' [min, max]. Ideal 4x4 grid → 4 containing
    # files; allow a couple of range-boundary straddles. A plain sort
    # on one column would leave the OTHER column's probe in all 16.
    for col, probe in (("l_partkey", g[0]), ("l_suppkey", g[2])):
        containing = sum(
            1 for lo, hi in ranges if lo[col] <= probe <= hi[col]
        )
        assert containing <= 7, (col, containing)


def test_morton_code_bit_exact(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "a long, b long"
    )
    got = [
        r["z"]
        for r in df.select(
            morton_code(F.col("a"), F.col("b")).alias("z")
        ).collect()
    ]

    def ref(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    want = [ref(a, b) for a, b in [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)]]
    assert got == want


def test_histogram_quantiles_close_to_exact(spark):
    from multimodal_vector_db_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    est = {
        (r["event_type"], r["qname"]): r["est"]
        for r in REGISTRY["histogram_quantiles"](spark, sf).collect()
    }
    ev = spark.read.parquet(f"{sf}/events.parquet")
    # histogram-CDF inversion can land up to ~1 order statistic away
    # from the interpolated exact quantile — in a sparse heavy tail that
    # is a large VALUE gap (observed 20% of spread for p99 on ~190
    # points), so bound each estimate by bracketing order statistics
    # (q ± 1.5/n) instead of a value tolerance
    exact = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        *[
            F.percentile("value", q).alias(f"{qn}_{side}")
            for qn, q0 in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99))
            for side, q in (
                ("lo", max(q0 - 0.015, 0.0)),
                ("hi", min(q0 + 0.015, 1.0)),
            )
        ],
    )
    for r in exact.collect():
        assert r["n"] > 150
        for qn in ("p50", "p95", "p99"):
            e = est[(r["event_type"], qn)]
            assert r[f"{qn}_lo"] - 3 <= e <= r[f"{qn}_hi"] + 3, (qn, e, r)
        assert (
            est[(r["event_type"], "p50")]
            <= est[(r["event_type"], "p95")]
            <= est[(r["event_type"], "p99")]
        )


def test_compaction_merges_small_preserves_rows(spark, lineitem, tmp_path):
    from multimodal_vector_db_spark.operators.compaction import (
        compact_directory,
        plan_compaction,
    )

    src = str(tmp_path / "fragmented")
    # simulate streaming-ingest fragmentation: 64 tiny files
    lineitem.repartition(64).write.parquet(src)
    dest = str(tmp_path / "compacted")
    plan = compact_directory(spark, src, dest, target_bytes=1 << 20)

    import glob

    n_src = len(glob.glob(f"{src}/*.parquet"))
    n_dest = len(glob.glob(f"{dest}/*.parquet"))
    assert n_dest < n_src
    # lossless: same rows, same multiset
    a = lineitem.groupBy("l_orderkey").count().orderBy("l_orderkey").collect()
    b = (
        spark.read.parquet(dest)
        .groupBy("l_orderkey")
        .count()
        .orderBy("l_orderkey")
        .collect()
    )
    assert a == b
    # every input file is accounted for exactly once
    planned = sorted(p for g in plan.bins for p in g) + sorted(plan.skipped)
    assert sorted(planned) == sorted(glob.glob(f"{src}/*.parquet"))


def test_compaction_planner_bin_packing():
    from multimodal_vector_db_spark.operators.compaction import (
        plan_compaction,
    )

    sizes = {"a": 90, "b": 60, "c": 40, "d": 30, "e": 10, "big": 200}
    plan = plan_compaction(sizes, target_bytes=100, keep_ratio=0.8)
    # 'big' (200) and 'a' (90 >= 80) stay; the rest pack into bins <=100
    assert "big" in plan.skipped and "a" in plan.skipped
    for g in plan.bins:
        assert sum(sizes[p] for p in g) <= 100
        assert len(g) > 1
    packed = [p for g in plan.bins for p in g]
    assert sorted(packed + plan.skipped) == sorted(sizes)


def test_schema_evolution_merge_read(spark, tmp_path):
    # schema evolution: a later ingest adds a column; mergeSchema reads
    # the union schema with nulls for the old files
    old = spark.createDataFrame([(1, "a")], "id long, text string")
    new = spark.createDataFrame(
        [(2, "b", "en")], "id long, text string, lang string"
    )
    path = str(tmp_path / "evolving")
    old.write.parquet(path)
    new.write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "text", "lang"}
    rows = {r["id"]: r["lang"] for r in merged.collect()}
    assert rows == {1: None, 2: "en"}


def test_zone_map_table_prunes_and_preserves_results(
    spark, lineitem, tmp_path
):
    from multimodal_vector_db_spark.operators.pruning import (
        build_stats_table,
        prune_files,
        read_pruned,
    )

    cols = ("l_partkey", "l_suppkey")
    dest = str(tmp_path / "zo")
    zorder_repartition(
        lineitem.select(*cols, "l_orderkey"), *cols, n_files=N_FILES
    ).write.parquet(dest)

    stats = build_stats_table(spark, dest, list(cols))
    assert stats.count() == N_FILES

    g = lineitem.agg(F.min("l_partkey"), F.max("l_partkey")).first()
    lo = g[0]
    hi = g[0] + (g[1] - g[0]) // 8  # narrow 1/8 range on one column
    files = prune_files(stats, "l_partkey", lo, hi)
    # the zone maps + z-order layout must actually skip files
    assert 0 < len(files) < N_FILES

    got = (
        read_pruned(spark, stats, "l_partkey", lo, hi)
        .groupBy()
        .agg(F.count("*"), F.sum("l_orderkey"))
        .first()
    )
    want = (
        lineitem.where(
            (F.col("l_partkey") >= lo) & (F.col("l_partkey") <= hi)
        )
        .groupBy()
        .agg(F.count("*"), F.sum("l_orderkey"))
        .first()
    )
    assert tuple(got) == tuple(want) and got[0] > 0


def test_compaction_rebuilds_zone_maps(spark, tmp_path):
    """Compaction invalidates the old per-file stats; stats_cols
    rebuilds them over the compacted layout and pruned reads stay
    exact."""
    from pyspark.sql import functions as F

    from multimodal_vector_db_spark.operators.compaction import (
        compact_directory,
    )
    from multimodal_vector_db_spark.operators.pruning import read_pruned

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    src = str(tmp_path / "small_files")
    emb.repartitionByRange(16, "vec_id").sortWithinPartitions(
        "vec_id"
    ).write.parquet(src)

    dest = str(tmp_path / "compacted")
    compact_directory(
        spark, src, dest, target_bytes=256 * 1024, stats_cols=["vec_id"]
    )
    stats = spark.read.parquet(dest + ".stats.parquet")
    got = read_pruned(spark, stats, "vec_id", 5, 25)
    want = emb.where((F.col("vec_id") >= 5) & (F.col("vec_id") <= 25))
    assert sorted(r["vec_id"] for r in got.collect()) == sorted(
        r["vec_id"] for r in want.collect()
    )
    # stats describe the compacted files, not the source layout
    files = {r["file"] for r in stats.collect()}
    assert all(f.startswith(dest) for f in files)
