"""Exactly-once streaming JDBC sink (s17, VERDICT r5 item 6): the
batch-id ledger must make redelivery a no-op.

Embedded Derby is a real JDBC engine with real transactions — the same
proxy the S5/S8 suite uses (no external database in this container;
the Postgres swap is a URL change).
"""

from __future__ import annotations

import pytest

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def url(tmp_path):
    return f"jdbc:derby:{tmp_path}/s17db;create=true"


def _count(spark, url, table):
    return spark.read.jdbc(url, table, properties={"driver": DRIVER}).count()


def test_replayed_batch_writes_zero_duplicates(spark, url):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.streaming.jobs import (
        ensure_jdbc_ledger,
        jdbc_exactly_once_commit,
    )

    rows = spark.range(100).selectExpr(
        "id AS event_id", "id % 7 AS user_id", "CAST(id AS DOUBLE) AS value"
    )
    props = {"driver": DRIVER}
    rows.limit(0).write.mode("overwrite").jdbc(url, "tgt", properties=props)
    ensure_jdbc_ledger(spark, url, "led")

    # batch 0 delivered: staged by 'executors', published by the ledger txn
    rows.write.mode("overwrite").jdbc(url, "stg", properties=props)
    assert jdbc_exactly_once_commit(spark, url, "stg", "tgt", "led", 0) is True
    assert _count(spark, url, "tgt") == 100

    # batch 0 REDELIVERED (driver restart replays the last uncommitted
    # micro-batch): restage is idempotent, publish is refused
    rows.write.mode("overwrite").jdbc(url, "stg", properties=props)
    assert jdbc_exactly_once_commit(spark, url, "stg", "tgt", "led", 0) is False
    assert _count(spark, url, "tgt") == 100

    # the next batch still goes through — the ledger blocks only its own id
    rows.selectExpr("event_id + 100 AS event_id", "user_id", "value").write.mode(
        "overwrite"
    ).jdbc(url, "stg", properties=props)
    assert jdbc_exactly_once_commit(spark, url, "stg", "tgt", "led", 1) is True
    assert _count(spark, url, "tgt") == 200


def test_end_to_end_stream_delivers_exactly_once(spark, url):
    from pyspark.sql import functions as F

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.streaming.jobs import (
        run_foreach_batch_jdbc_append,
    )

    rows = spark.range(500).selectExpr(
        "id AS event_id", "id % 13 AS user_id", "CAST(id * 0.5 AS DOUBLE) AS value"
    )
    back = run_foreach_batch_jdbc_append(
        spark, rows, url, driver=DRIVER, prefix="e2e", n_batches=3
    )
    assert back.count() == 500
    assert back.select(F.count_distinct("event_id")).collect()[0][0] == 500
    # ledger recorded one row per micro-batch
    led = spark.read.jdbc(url, "e2e_ledger", properties={"driver": DRIVER})
    assert led.count() == 3
