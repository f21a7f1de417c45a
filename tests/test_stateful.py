"""applyInPandasWithState operators: state must survive across
micro-batches (the property a batch groupBy can't express), and the
drained result must equal the batch aggregate over all inputs."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table
from aws_etl_pipeline_financial_streamlit_dashboard_spark.streaming.stateful import (
    running_user_totals,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stateful_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_state_accumulates_across_microbatches(spark, sf_dir, tmpdir):
    src = os.path.join(tmpdir, "src")
    ckpt = os.path.join(tmpdir, "ckpt")
    events = read_table(spark, sf_dir, "events").select("user_id", "value")

    # two source files + maxFilesPerTrigger=1 → two micro-batches:
    # the second batch's emissions must include the first batch's counts
    half1 = events.filter(F.col("user_id") % 2 == 0)
    half2 = events.filter(F.col("user_id") % 2 == 1)
    both = events
    half1.coalesce(1).write.parquet(src)
    half2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("user_id bigint, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("stateful_totals_test")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.table("stateful_totals_test").collect()
    }
    # update-mode memory sink: later emissions overwrite... no — they
    # append; but users are disjoint across the two batches here, so
    # each user appears exactly once and carries its full total
    expected = {
        r["user_id"]: (r["n"], r["cents"] / 100.0)
        for r in both.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert got == expected


def test_state_carries_forward_for_same_key(spark, tmpdir):
    """Same user in both micro-batches: the second emission must report
    the lifetime total, proving GroupState persisted."""
    src = os.path.join(tmpdir, "src")
    ckpt = os.path.join(tmpdir, "ckpt")
    spark.createDataFrame(
        [(1, 10.0), (1, 5.0)], "user_id long, value double"
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(1, 2.5)], "user_id long, value double"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("user_id bigint, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("stateful_carry_test")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        (r["n_events"], r["total_value"])
        for r in spark.table("stateful_carry_test").collect()
    )
    # one emission per micro-batch; the final one is the lifetime total
    # (order of the two source files is nondeterministic, so check the
    # final cumulative row rather than the intermediate)
    assert len(rows) == 2
    assert rows[-1] == (3, 17.5)


def test_sessionize_emits_open_sessions(spark, tmpdir):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.streaming.stateful import (
        sessionize_users,
    )

    src = os.path.join(tmpdir, "src")
    ckpt = os.path.join(tmpdir, "ckpt")
    base = 1_700_000_000_000_000  # epoch micros
    pdf = [
        (1, base),
        (1, base + 60_000_000),      # +60s, same session
        (2, base + 5_000_000),
    ]
    spark.createDataFrame(
        [(u, t) for u, t in pdf], "user_id long, ts_us long"
    ).selectExpr("user_id", "timestamp_micros(ts_us) AS ts", "1.0 AS value").coalesce(
        1
    ).write.parquet(src)

    stream = spark.readStream.schema("user_id bigint, ts timestamp, value double").parquet(src)
    q = (
        sessionize_users(stream, gap_ms=30 * 60 * 1000)
        .writeStream.format("memory")
        .queryName("sessionize_open_test")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # ProcessingTimeTimeout keeps the query alive to fire pending
    # timeouts even under availableNow — poll for the data batch's
    # emissions, then stop explicitly
    import time

    for _ in range(60):
        if spark.table("sessionize_open_test").count() >= 2:
            break
        time.sleep(2)
    q.stop()
    q.awaitTermination(timeout=60)
    rows = {r["user_id"]: r for r in spark.table("sessionize_open_test").collect()}
    assert rows[1]["n_events"] == 2 and rows[1]["closed"] is False
    assert (rows[1]["session_end"] - rows[1]["session_start"]).total_seconds() == 60
    assert rows[2]["n_events"] == 1


def test_ttl_variant_evicts_idle_state(spark, tmpdir):
    """running_user_totals_ttl: after ttl_ms of processing-time
    inactivity each user's state fires a timeout, emits a final
    evicted=true row with the correct totals, and is removed — the
    bounded-state contract for unbounded key cardinality."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.streaming.stateful import (
        running_user_totals_ttl,
    )

    src = os.path.join(tmpdir, "src")
    ckpt = os.path.join(tmpdir, "ckpt")
    spark.createDataFrame(
        [(1, 10.0), (1, 2.5), (2, 5.0)], "user_id long, value double"
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("user_id bigint, value double").parquet(src)
    q = (
        running_user_totals_ttl(stream, ttl_ms=2000)
        .writeStream.format("memory")
        .queryName("ttl_evict_test")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # ProcessingTimeTimeout keeps the query alive to fire pending
    # timeouts even under availableNow — poll for the eviction rows,
    # then stop explicitly
    import time

    for _ in range(60):
        evicted = spark.sql(
            "SELECT * FROM ttl_evict_test WHERE evicted"
        ).count()
        if evicted >= 2:
            break
        time.sleep(2)
    q.stop()
    q.awaitTermination(timeout=60)

    rows = spark.table("ttl_evict_test").collect()
    live = {r["user_id"]: r for r in rows if not r["evicted"]}
    dead = {r["user_id"]: r for r in rows if r["evicted"]}
    # the data batch emitted the running rows...
    assert live[1]["n_events"] == 2 and live[1]["total_value"] == 12.5
    assert live[2]["n_events"] == 1 and live[2]["total_value"] == 5.0
    # ...and the TTL fired a final flush per idle user with the same totals
    assert dead[1]["n_events"] == 2 and dead[1]["total_value"] == 12.5
    assert dead[2]["n_events"] == 1 and dead[2]["total_value"] == 5.0
