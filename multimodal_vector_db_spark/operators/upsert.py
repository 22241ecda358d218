"""Batch merge/upsert: latest-version-wins corpus maintenance.

The reference mutates its index in place (`vector_index.py:94-103`
append, `vector_index.py:219-222` tombstone delete). A lakehouse
corpus instead applies change sets as MERGE: union the base table with
the updates and keep, per key, the highest-version row. The same shape
serves SCD-1 dimension maintenance and re-embedding runs (new model
version re-embeds a slice; merge keeps the newest vector per id).

Scale shape: one shuffle on the key for the row_number window. At
100 TB prefer writing the merged result partitioned/bucketed by the
key so the NEXT merge's window reuses the layout, and compact change
sets are far smaller than the base — Spark's window reads both sides
but only the key/version columns gate the decision, so column pruning
keeps the exchange narrow if callers select before merging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_col: str,
    version_col: str = "version",
) -> DataFrame:
    """Latest-version-wins merge of ``updates`` into ``base`` (both must
    share a schema including ``version_col``; ties break toward
    ``updates`` deterministically via a source rank). Rows present only
    in one side pass through; a key present in both keeps the higher
    (version, source) row. Delete support: carry a ``deleted`` flag in
    the update row and filter after merging (tombstone semantics, P7).
    """
    b = base.withColumn("_src", F.lit(0))
    u = updates.withColumn("_src", F.lit(1))
    # Final tie-break on a hash of the whole row: if one side itself
    # contains duplicate (key, version) rows, the survivor is still
    # deterministic (input order never decides).
    merged = b.unionByName(u)
    non_meta = [c for c in merged.columns if c != "_src"]
    w = Window.partitionBy(key_col).orderBy(
        F.col(version_col).desc(),
        F.col("_src").desc(),
        F.xxhash64(*[F.col(c) for c in non_meta]).asc(),
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
