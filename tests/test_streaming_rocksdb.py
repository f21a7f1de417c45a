"""RocksDB state store provider — the scalable state backend.

The default HDFSBackedStateStoreProvider keeps every key of every
stateful operator's state in EXECUTOR MEMORY (a per-partition in-memory
map, snapshotted to the checkpoint); at 100 TB-stream state sizes
(dedup key sets, large session maps, stream-stream join buffers) that
is the component that OOMs first. RocksDBStateStoreProvider spills
state to local disk with block-cache reads and incremental
checkpointing — the production choice for large state.

This test pins that the engine's stateful shapes actually RUN on
RocksDB (the provider ships inside Spark 4 — no extra jars) and return
results identical to the default provider: a watermarked tumbling
aggregate and a dropDuplicates dedup, both real AvailableNow streaming
queries over the events file source. Config is per-query-start
(picked up from the session at query start; existing checkpoints pin
their provider, so each run gets a fresh checkpoint).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.functions.scalars import (
    event_time,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import (
    read_table,
)

_ROCKS = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _events_stream(spark, sf_dir):
    read_table(spark, sf_dir, "events")  # raw-read confs
    glob = os.path.join(sf_dir, "[e]vents.parquet")
    return (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, event_type string, "
            "value double, ts timestamp_ntz"
        )
        .format("parquet")
        .load(glob)
    )


def _drain(spark, df, mode, name, ckpt_root):
    (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", os.path.join(ckpt_root, name))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return sorted(tuple(r) for r in spark.table(name).collect())


@pytest.mark.parametrize("shape", ["windowed_agg", "dedup"])
def test_stateful_results_identical_on_rocksdb(spark, sf_dir, tmp_path, shape):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    results = {}
    try:
        for provider in ("default", "rocksdb"):
            if provider == "rocksdb":
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", _ROCKS
                )
            elif prev:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev
                )
            else:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            stream = _events_stream(spark, sf_dir)
            ts = event_time(F.col("ts")).alias("ts")
            if shape == "windowed_agg":
                df = (
                    stream.select("event_type", "value", ts)
                    .withWatermark("ts", "1 hour")
                    .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
                    .agg(F.count("*").alias("n"))
                    .select(
                        F.col("window.start").cast("string").alias("ws"),
                        "event_type",
                        "n",
                    )
                )
                mode = "append"
            else:
                df = (
                    stream.select("user_id", "event_type", ts)
                    .withWatermark("ts", "1 hour")
                    .dropDuplicates(["user_id", "event_type"])
                    .groupBy("event_type")
                    .agg(F.count("*").alias("n_distinct_users"))
                )
                mode = "complete"
            results[provider] = _drain(
                spark,
                df,
                mode,
                f"rocks_{shape}_{provider}",
                str(tmp_path),
            )
            if provider == "rocksdb":
                # the provider really engaged: RocksDB working dirs exist
                # under the checkpoint's state store tree
                state_dir = os.path.join(
                    str(tmp_path), f"rocks_{shape}_rocksdb", "state"
                )
                assert os.path.isdir(state_dir)
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert results["default"] == results["rocksdb"]
    assert len(results["rocksdb"]) > 0


@pytest.mark.parametrize(
    "entry",
    ["s21_streaming_hll_registers", "s22_streaming_histogram_quantiles"],
)
def test_sketch_state_entries_identical_on_rocksdb(spark, sf_dir, entry):
    """Round-9 sketch-as-streaming-state entries (s21 MAX-merge HLL
    registers, s22 SUM-merge histogram buckets) produce identical
    finished frames on RocksDB — the catalog callables themselves run
    under both providers (each run drains into a FRESH checkpoint, so
    the provider conf binds at query start)."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import QUERIES

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    results = {}
    try:
        for provider in ("default", "rocksdb"):
            if provider == "rocksdb":
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", _ROCKS
                )
            elif prev:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev
                )
            else:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            results[provider] = sorted(
                tuple(r) for r in QUERIES[entry].spark(spark, sf_dir).collect()
            )
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert results["default"] == results["rocksdb"]
    assert len(results["default"]) > 0
