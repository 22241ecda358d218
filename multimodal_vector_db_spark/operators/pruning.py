"""Zone-map stats table + file-level pruning — the metadata layer that
makes Z-order/sort layouts pay off at 100 TB.

Parquet footers already carry min-max stats, but at warehouse scale
reading every footer to plan one query is itself a large IO job (and on
object stores, a request-cost job). Table formats therefore persist the
per-file stats ONCE in a manifest; the planner prunes against that
small table and opens only surviving files. This module is that layer
in miniature: build the stats table from a directory (driver-side
footer scan at build time — the cost is paid once, at write), then
answer "which files can contain predicate P" with a DataFrame filter.

`zorder_repartition` (functions/layout.py) makes the per-file ranges
tight; this makes consulting them O(stats-table) instead of O(footers).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_stats_table(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file zone maps for ``cols``: (file, n_rows, <c>_min, <c>_max
    per column), aggregated across row groups from the parquet footers.
    Run once per write/compaction and persist next to the data; queries
    then plan from this table alone."""
    import pyarrow.parquet as pq

    # Spark SQL type of each stats column, derived from the actual
    # parquet logical types so zone maps work for any orderable column
    # (int / float / string / date / timestamp), not just integers.
    _ARROW_TO_SQL = {
        "int8": "int", "int16": "int", "int32": "int", "int64": "long",
        "uint8": "int", "uint16": "int", "uint32": "long", "uint64": "long",
        "float": "double", "double": "double",
        "string": "string", "large_string": "string",
        "date32[day]": "date", "bool": "boolean",
    }

    def _sql_type(arrow_type) -> str:
        s = str(arrow_type)
        if s.startswith("timestamp"):
            return "timestamp"
        if s.startswith("decimal"):
            return s
        if s not in _ARROW_TO_SQL:
            raise TypeError(
                f"build_stats_table: unsupported zone-map column type "
                f"{s!r} — orderable scalar columns only"
            )
        return _ARROW_TO_SQL[s]

    col_types: dict[str, str] = {}
    rows = []
    # recursive: hive-partitioned layouts nest data files one directory
    # per partition value
    files = sorted(
        glob.glob(os.path.join(path, "*.parquet"))
        + glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    for f in dict.fromkeys(files):
        pf = pq.ParquetFile(f)
        arrow_schema = pf.schema_arrow
        for c in cols:
            if c in arrow_schema.names and c not in col_types:
                col_types[c] = _sql_type(arrow_schema.field(c).type)
        md = pf.metadata
        stat: dict = {"file": f, "n_rows": md.num_rows}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    mn, mx = col.statistics.min, col.statistics.max
                    k_mn, k_mx = f"{name}_min", f"{name}_max"
                    stat[k_mn] = (
                        mn if k_mn not in stat else min(stat[k_mn], mn)
                    )
                    stat[k_mx] = (
                        mx if k_mx not in stat else max(stat[k_mx], mx)
                    )
        rows.append(stat)
    schema = "file string, n_rows long, " + ", ".join(
        f"{c}_min {col_types.get(c, 'long')}, "
        f"{c}_max {col_types.get(c, 'long')}"
        for c in cols
    )
    return spark.createDataFrame(
        [
            tuple(
                [r["file"], r["n_rows"]]
                + [r.get(f"{c}_{s}") for c in cols for s in ("min", "max")]
            )
            for r in rows
        ],
        schema,
    )


def prune_files(
    stats: DataFrame, col: str, lo, hi
) -> list[str]:
    """Files whose [min, max] for ``col`` intersects [lo, hi] — the
    candidate set a range predicate must read (files with missing stats
    are conservatively kept)."""
    keep = stats.where(
        F.col(f"{col}_min").isNull()
        | ((F.col(f"{col}_max") >= lo) & (F.col(f"{col}_min") <= hi))
    )
    return [r["file"] for r in keep.select("file").collect()]


def read_pruned(
    spark: SparkSession, stats: DataFrame, col: str, lo, hi
) -> DataFrame:
    """Scan ONLY the surviving files and apply the exact predicate —
    the two-phase plan (metadata prune, then exact filter) every
    lakehouse reader runs."""
    files = prune_files(stats, col, lo, hi)
    if not files:
        raise ValueError("no files survive the predicate")
    return spark.read.parquet(*files).where(
        (F.col(col) >= lo) & (F.col(col) <= hi)
    )
