"""Bucketed range join: boundary semantics (exclusive lower, inclusive
upper) and cross-bucket matches must survive the bucketing rewrite."""

from __future__ import annotations

import datetime as dt

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.rangejoin import (
    bucketed_range_join,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_boundaries_and_cross_bucket(spark):
    left = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:30:00")),  # window (10:30, 11:30]
            (2, "B", _ts("2024-01-01 10:00:00")),  # window (10:00, 11:00]
        ],
        "l_id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "A", _ts("2024-01-01 10:30:00")),  # == left ts: excluded (strict >)
            (11, "A", _ts("2024-01-01 10:45:00")),  # same bucket: included
            (12, "A", _ts("2024-01-01 11:15:00")),  # next bucket: included
            (13, "A", _ts("2024-01-01 11:30:00")),  # exactly +1h: included (<=)
            (14, "A", _ts("2024-01-01 11:30:01")),  # past window: excluded
            (15, "B", _ts("2024-01-01 10:59:59")),  # other key, in B's window
            (16, "A", _ts("2024-01-01 10:59:59")),  # key A matches left 1 only
        ],
        "r_id long, k string, r_ts timestamp",
    )
    out = bucketed_range_join(
        left, right, on=["k"], left_ts="ts", right_ts="r_ts", window_seconds=3600
    )
    got = sorted((r["l_id"], r["r_id"]) for r in out.collect())
    assert got == [(1, 11), (1, 12), (1, 13), (1, 16), (2, 15)]


def test_no_duplicate_pairs_from_bucket_explosion(spark):
    """A right row in the left row's own bucket must appear once even
    though the left row is exploded into two buckets."""
    left = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01 10:00:30"))], "l_id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, "A", _ts("2024-01-01 10:20:00"))],
        "r_id long, k string, r_ts timestamp",
    )
    out = bucketed_range_join(
        left, right, on=["k"], left_ts="ts", right_ts="r_ts", window_seconds=3600
    )
    assert out.count() == 1
