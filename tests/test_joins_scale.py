"""Scale-join strategy tests: bucketed co-located joins must compile
WITHOUT a shuffle exchange; salted joins must return exactly the plain
join's rows while spreading a hot key over many shuffle keys.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from multimodal_vector_db_spark.operators.joins import (
    bucketed_join,
    salted_join,
    write_bucketed_table,
)

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed_table(orders, "t_orders_b", "o_orderkey", n_buckets=8)
    write_bucketed_table(li, "t_lineitem_b", "o_orderkey", n_buckets=8)
    joined = bucketed_join(spark, "t_orders_b", "t_lineitem_b", on="o_orderkey")
    plan = _plan(joined)
    # co-located buckets: sort-merge join with no exchange on either side
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    # and the result is the real join
    expected = orders.join(li, on="o_orderkey").count()
    assert joined.count() == expected


def test_salted_join_matches_plain_join(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_name"
    )
    # avoid broadcast so the salted shuffle path is actually exercised
    plain = ev.join(cust.hint("shuffle_hash"), on="user_id")
    salted = salted_join(ev, cust.hint("shuffle_hash"), on="user_id", n_salts=8)
    assert salted.count() == plain.count()
    a = plain.groupBy("user_id").count()
    b = salted.groupBy("user_id").count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_salt_distributes_hot_key(spark):
    # a synthetic 90%-hot key must fan out over multiple salts
    hot = spark.range(0, 1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 50).select(F.col("id").alias("k"), F.lit("x").alias("d"))
    out = salted_join(hot, dim, on="k", n_salts=8)
    assert out.count() == hot.join(dim, on="k").count()
    salts = (
        hot.withColumn(
            "__salt", F.pmod(F.hash(*[c for c in hot.columns]), F.lit(8))
        )
        .where(F.col("k") == 7)
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts >= 6  # the hot key spreads over nearly all 8 sub-keys


def test_asof_join_semantics(spark):
    # most-recent-at-or-before semantics: exact-tie matches, in-between
    # picks the latest earlier row, before-any-right yields NULL
    from multimodal_vector_db_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 100, 5), (1, 100, 10), (1, 100, 25), (2, 200, 7)],
        "lid INT, k INT, t BIGINT",
    ).select("lid", "k", "t")
    right = spark.createDataFrame(
        [(100, 10, "a"), (100, 20, "b"), (100, 30, "c")],
        "k INT, rt BIGINT, tag STRING",
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="rt", right_payload=["rt", "tag"]
    )
    got = {(r["lid"], r["t"]): (r["rt"], r["tag"]) for r in out.collect()}
    assert got[(1, 5)] == (None, None)      # before any right row
    assert got[(1, 10)] == (10, "a")        # exact tie is visible
    assert got[(1, 25)] == (20, "b")        # latest at-or-before
    assert got[(2, 7)] == (None, None)      # key with no right rows
