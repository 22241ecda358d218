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
