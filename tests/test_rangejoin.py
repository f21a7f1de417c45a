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


def test_interval_overlap_join_semantics(spark):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    # block_size=10; intervals chosen to cover: same-cell overlap,
    # multi-shared-cell overlap (pair must appear ONCE), touching
    # endpoints (half-open: no overlap), disjoint, cross-key, and an
    # empty interval (dropped).
    left = spark.createDataFrame(
        [
            (1, "A", 0, 25),    # spans cells 0-2
            (2, "A", 30, 31),   # single unit
            (3, "B", 0, 10),    # other key
            (4, "A", 40, 40),   # empty: hi == lo -> dropped
        ],
        "l_id long, k string, lo long, hi long",
    )
    right = spark.createDataFrame(
        [
            (10, "A", 5, 22),    # overlaps l1 in cells 0..2 -> once
            (11, "A", 25, 35),   # touches l1 at 25 (half-open: NO), overlaps l2
            (12, "A", 31, 40),   # touches l2 at 31: NO
            (13, "B", 9, 12),    # overlaps l3 only (cross-key isolation)
            (14, "A", 38, 45),   # covers l4's empty point: NO (empty dropped)
        ],
        "r_id long, k string, r_lo long, r_hi long",
    )
    out = interval_overlap_join(
        left, right, on=["k"],
        left_lo="lo", left_hi="hi", right_lo="r_lo", right_hi="r_hi",
        block_size=10,
    )
    got = sorted((r["l_id"], r["r_id"]) for r in out.collect())
    assert got == [(1, 10), (2, 11), (3, 13)]


def test_interval_overlap_join_multi_cell_pair_emitted_once(spark):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    # both intervals span the same 5 cells -> candidate pair appears in
    # 5 cells; the GREATEST-anchor condition must emit it exactly once
    left = spark.createDataFrame([(1, 0, 50)], "l_id long, lo long, hi long")
    right = spark.createDataFrame([(2, 3, 48)], "r_id long, r_lo long, r_hi long")
    out = interval_overlap_join(
        left, right, on=[], left_lo="lo", left_hi="hi",
        right_lo="r_lo", right_hi="r_hi", block_size=10,
    )
    assert out.count() == 1


def test_interval_overlap_join_rejects_bad_block(spark):
    import pytest

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    df = spark.range(1).selectExpr("id", "id AS lo", "id + 1 AS hi")
    with pytest.raises(ValueError, match="block_size"):
        interval_overlap_join(
            df, df.selectExpr("id AS r_id", "lo AS r_lo", "hi AS r_hi"),
            on=[], left_lo="lo", left_hi="hi",
            right_lo="r_lo", right_hi="r_hi", block_size=0,
        )
