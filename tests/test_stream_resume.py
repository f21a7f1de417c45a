"""Checkpoint-resume semantics: a second AvailableNow run against the
same checkpoint must process ONLY files that arrived since the first
run — the exactly-once incremental-refresh contract the reference
approximates with marker files (retrieval.py:156-160) and Structured
Streaming provides natively via the file-source log."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table


def _raw_counts_stream(spark, src_dir):
    schema = "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, value double, props string"
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(src_dir)
        .select("event_id", "event_type")
    )


def test_available_now_resume_processes_only_new_files(spark, sf_dir, tmp_path):
    # arrange: a source dir with one file; sink + checkpoint dirs
    src = tmp_path / "incoming"
    src.mkdir()
    sink = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")

    events = read_table(spark, sf_dir, "events")  # sets raw-read confs
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    first.write.mode("overwrite").parquet(str(tmp_path / "stage1"))
    for f in os.listdir(tmp_path / "stage1"):
        if f.endswith(".parquet"):
            shutil.copy(tmp_path / "stage1" / f, src / f"a_{f}")

    def drain():
        (
            _raw_counts_stream(spark, str(src))
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    # act 1: drain the first batch of files
    drain()
    n1 = spark.read.parquet(sink).count()
    assert n1 == first.count()

    # act 2: RE-RUN with no new files — the checkpoint must make this
    # a no-op (no duplicate ingestion on retry)
    drain()
    assert spark.read.parquet(sink).count() == n1

    # act 3: land new files, re-run — only the delta is appended
    second.write.mode("overwrite").parquet(str(tmp_path / "stage2"))
    for f in os.listdir(tmp_path / "stage2"):
        if f.endswith(".parquet"):
            shutil.copy(tmp_path / "stage2" / f, src / f"b_{f}")
    drain()
    landed = spark.read.parquet(sink)
    assert landed.count() == events.count()
    # every event landed exactly once
    assert landed.select("event_id").distinct().count() == events.count()
