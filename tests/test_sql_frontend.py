"""SQL front-end parity: the engine's surface is also plain SQL — the
ANSI-portable subset of the declared oracles must run UNCHANGED through
spark.sql() over registered views and produce exactly the DataFrame-API
results. (DuckDB-dialect oracles — list_*, epoch_us — are excluded;
they exist for the cross-engine hash gate, not for Spark.)"""

from __future__ import annotations

import pytest

from multimodal_vector_db_spark.queries import ORACLES, REGISTRY

SF_DIR = "/root/testdata/sf0.001"

PORTABLE = ["tpch_q13", "merge_upsert_docs", "snapshot_diff"]

TABLES = ["documents", "customer", "orders"]


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    for t in TABLES:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").createOrReplaceTempView(t)


@pytest.mark.parametrize("name", PORTABLE)
def test_oracle_sql_runs_on_spark(spark, name):
    via_sql = sorted(
        tuple(r) for r in spark.sql(ORACLES[name]).collect()
    )
    via_df = sorted(
        tuple(r) for r in REGISTRY[name](spark, SF_DIR).collect()
    )
    assert via_sql == via_df and len(via_sql) > 0


# --- sql() facade: the engine drivable without the Python builders ----

def test_sql_facade_knn_matches_dataframe_api(spark):
    """Pure-SQL kNN over the registered catalog must equal the
    DataFrame-API path bit-for-bit (same sequential-fold dot)."""
    from multimodal_vector_db_spark.sql import sql

    out = sql(
        spark,
        """
        WITH q AS (SELECT CAST(embedding AS ARRAY<DOUBLE>) AS q_emb
                   FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id AS id,
               vec_dot(CAST(e.embedding AS ARRAY<DOUBLE>), q.q_emb) AS sim
        FROM embeddings e CROSS JOIN q
        ORDER BY sim DESC, id ASC
        LIMIT 10
        """,
        sf_dir=SF_DIR,
    ).collect()
    df_out = (
        REGISTRY["knn_single"](spark, SF_DIR)
        .select("id", "sim")
        .collect()
    )
    assert [tuple(r) for r in out] == [tuple(r) for r in df_out]


def test_sql_facade_vector_functions(spark):
    from multimodal_vector_db_spark.sql import register_functions

    register_functions(spark)
    row = spark.sql(
        """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                  vec_norm(array(3.0D, 4.0D)) AS n,
                  vec_normalize(array(0.0D, 0.0D)) AS z,
                  vec_cosine(array(1.0D, 0.0D), array(0.0D, 0.0D)) AS c,
                  vec_l2(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS l,
                  matryoshka(array(3.0D, 4.0D, 9.0D), 2) AS m,
                  similarity_pct(1.0D) AS p"""
    ).first()
    assert row["d"] == 11.0 and row["n"] == 5.0
    assert row["z"] == [0.0, 0.0] and row["c"] is None
    assert row["l"] == 5.0
    assert row["m"] == [0.6, 0.8] and row["p"] == 50.0


def test_sql_facade_plan_pushdown(spark):
    """A SQL filter over a catalog view must reach the parquet scan —
    views are lazy, not materialized."""
    from multimodal_vector_db_spark.sql import sql

    plan = (
        sql(spark, "SELECT doc_id FROM documents WHERE lang = 'en'",
            sf_dir=SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan, plan
