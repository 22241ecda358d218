"""Scale-out join strategies (SURVEY §4 / the 100 TB design):

- **Bucketed co-located join**: both fact tables written
  ``bucketBy(n, key)`` share a partitioning, so the join compiles with
  NO shuffle exchange — at 100 TB the difference between re-shuffling
  terabytes per query and reading co-located buckets.
- **Salted join**: a skewed key (one user with 10% of events) turns one
  reducer into the straggler. Salting fans the hot side out over
  ``n_salts`` sub-keys and replicates the small side, restoring
  balance. AQE's skew-join handles sort-merge skew automatically; the
  explicit form covers broadcast-ineligible dimension joins and gives
  deterministic plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Materialize a table bucketed (and optionally sorted) by the join
    key. Joins between tables bucketed the same way skip the exchange."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # the in-memory catalog forgets tables across sessions but their
    # warehouse directories persist — clear the location explicitly
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table_name}", ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed saved tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on=on)


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    salt_col: str = "__salt",
) -> DataFrame:
    """Equi-join where ``skewed`` has heavy hitters on the join key:
    the skewed side gets a deterministic per-row salt (hash-based, not
    random — plans must be reproducible), the dim side is exploded
    ``n_salts``× so every (key, salt) pair still matches exactly once.
    Shuffle keys become (key, salt) — the hot key spreads over n_salts
    reducers."""
    salted_left = skewed.withColumn(
        salt_col, F.pmod(F.hash(*[c for c in skewed.columns]), F.lit(n_salts))
    )
    replicated_dim = dim.withColumn(
        salt_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    out = salted_left.join(replicated_dim, on=[on, salt_col])
    return out.drop(salt_col)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """As-of join: for every left row, attach the most recent right row
    (right_ts <= left_ts) within the same ``on`` key — the standard
    event↔dimension-history alignment Spark has no native operator for.

    Implementation is the scale-correct union+window form, NOT a range
    join: both sides are tagged and unioned, one window per key ordered
    by time carries the last-seen right payload forward, then left rows
    are filtered back out. ONE shuffle on the key — a range/theta join
    would be quadratic per key.

    Ties (right_ts == left_ts): the right row sorts BEFORE the left row
    (tag order), so an exactly-simultaneous right row is visible —
    matching DuckDB ASOF JOIN's `right_ts <= left_ts` semantics.
    """
    from pyspark.sql import Window

    lt = left.withColumn("__tag", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = (
        right.select(
            on,
            *right_payload,
            F.lit(0).alias("__tag"),
            F.col(right_ts).alias("__ts"),
        )
    )
    both = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        "*",
        *[
            F.last(
                F.when(F.col("__tag") == 0, F.col(c)), ignorenulls=True
            ).over(w).alias(f"__asof_{c}")
            for c in right_payload
        ],
    )
    out = carried.where(F.col("__tag") == 1).drop("__tag", "__ts")
    for c in right_payload:
        out = out.drop(c).withColumnRenamed(f"__asof_{c}", c)
    return out


def bloom_bit_positions(
    key, m_bits: int = 4096, k_hashes: int = 3
):
    """``k_hashes`` Bloom bit positions for ``key`` — one md5 per hash
    (salted ``bf{i}:``), 8 hex nibbles → BIGINT, mod ``m_bits``. Pure
    deterministic column arithmetic, reproducible in any engine with
    md5 (the DuckDB oracle re-derives identical positions, false
    positives included)."""
    key = F.col(key) if isinstance(key, str) else key
    s = key.cast("string")
    return [
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"bf{i}:"), s)), 1, 8),
                16,
                10,
            ).cast("long")
            % m_bits
        ).alias(f"p{i}")
        for i in range(k_hashes)
    ]


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Semi-join ``big`` against ``small`` WITHOUT shuffling ``big``:
    build a Bloom filter over ``small``'s keys (the set of distinct bit
    positions, aggregated map-side into one sorted array row), broadcast
    it, and keep big-side rows whose ``k_hashes`` positions are all set.

    This is the explicit form of Spark's runtime-row-level-filter
    pushdown: at 100 TB the big side stays a narrow filtered scan —
    no exchange at all — while the build side reduces to one broadcast
    row holding a dense ``m_bits``-bit bitmap packed into 64-bit words
    (a map word-index → word, built with one tiny two-level
    aggregation). Each probe is O(1): ``k_hashes`` map lookups + AND
    masks per row — not a scan over the position set. It admits false
    positives at the usual Bloom rate ((1 - e^{-kn/m})^k); follow with
    the exact join when exactness is required — the filter has already
    discarded the bulk of the scan before the shuffle.
    """
    pos = small.select(
        F.explode(
            F.array(*bloom_bit_positions(small_key, m_bits, k_hashes))
        ).alias("p")
    )
    # pyspark's shiftleft() wrapper only takes a Python-int shift;
    # call the SQL function directly for a column-valued shift
    def _shl(bit_col):
        return F.call_function(
            "shiftleft", F.lit(1).cast("long"), bit_col.cast("int")
        )

    words = pos.groupBy((F.col("p") / 64).cast("long").alias("w")).agg(
        F.bit_or(_shl(F.col("p") % 64)).alias("bits")
    )
    build = words.agg(
        F.map_from_arrays(
            F.collect_list("w"), F.collect_list("bits")
        ).alias("bitmap")
    )
    probed = big.join(F.broadcast(build))
    cond = F.lit(True)
    for p in bloom_bit_positions(big_key, m_bits, k_hashes):
        mask = _shl(p % 64)
        word = F.coalesce(
            F.try_element_at(F.col("bitmap"), (p / 64).cast("long")),
            F.lit(0).cast("long"),
        )
        cond = cond & (word.bitwiseAND(mask) == mask)
    return probed.where(cond).drop("bitmap")


def frequency_split_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    weight_col: str,
    head_rows: int = 1024,
) -> DataFrame:
    """Inner join where the ``head_rows`` heaviest build-side keys (by
    ``weight_col``) are broadcast and the long tail is shuffle-joined.

    The Zipf-skew pattern: joining token-level rows back to a global
    frequency table sends every occurrence of a hot key ("the") to one
    reducer. Salting (``salted_join``) fixes this by replication; the
    frequency split fixes it by routing the hot head through a
    broadcast hash join (no shuffle at all for the skewed rows) while
    the tail — huge in cardinality, flat in frequency — takes the
    normal shuffle join. ``orderBy().limit()`` on the build side
    compiles to TakeOrdered (no global sort), and the anti-join that
    carves the probe side is itself against the broadcast head.
    """
    head = F.broadcast(
        right.orderBy(F.col(weight_col).desc(), key).limit(head_rows)
    )
    tail = right.join(head.select(key), key, "left_anti")
    hot = left.join(head, key, "inner")
    cold = left.join(head.select(key), key, "left_anti").join(
        tail, key, "inner"
    )
    return hot.unionByName(cold)
