"""Unit tests for the union-merge as-of join (operators/asof.py) —
known-answer fixtures covering match, tie, no-prior-row, and tolerance
semantics (the catalog's x17 covers oracle parity at sf0.01)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _fixtures(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:05"), 100.0),
            (2, "A", _ts("2024-01-01 10:00:00"), 101.0),  # exact-tie with quote
            (3, "A", _ts("2024-01-01 09:59:00"), 102.0),  # before any quote
            (4, "B", _ts("2024-01-01 10:05:00"), 103.0),
            (5, "C", _ts("2024-01-01 10:00:00"), 104.0),  # key with no quotes
        ],
        "trade_id long, sym string, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 99.5),
            ("A", _ts("2024-01-01 10:00:03"), 99.7),
            ("B", _ts("2024-01-01 10:00:00"), 88.0),
        ],
        "sym string, ts timestamp, quote double",
    )
    return trades, quotes


def test_asof_basic_semantics(spark):
    trades, quotes = _fixtures(spark)
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts", value_cols=["quote"]
    )
    got = {r["trade_id"]: r["quote"] for r in out.collect()}
    assert got == {
        1: 99.7,  # latest quote at/before 10:00:05
        2: 99.5,  # equal timestamps match (>= semantics)
        3: None,  # no prior quote
        4: 88.0,
        5: None,  # key never quoted
    }
    # row preservation: left-outer — every trade exactly once
    assert out.count() == trades.count()
    assert set(out.columns) == {"sym", "ts", "trade_id", "price", "quote"}


def test_asof_tolerance(spark):
    trades, quotes = _fixtures(spark)
    out = asof_join(
        trades,
        quotes,
        on=["sym"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["quote"],
        tolerance=F.expr("INTERVAL 3 SECONDS"),
    )
    got = {r["trade_id"]: r["quote"] for r in out.collect()}
    # trade 1 at 10:00:05: latest quote 10:00:03 within 3s -> kept;
    # trade 4 at 10:05:00: quote 10:00:00 older than 3s -> voided
    assert got[1] == 99.7
    assert got[4] is None
    assert got[2] == 99.5  # 0s age


def test_asof_single_shuffle_plan(spark):
    """The whole join must cost one exchange (on the key) — the point of
    union-merge over a range join."""
    trades, quotes = _fixtures(spark)
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts", value_cols=["quote"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_asof_forward_semantics(spark):
    trades, quotes = _fixtures(spark)
    out = asof_join(
        trades,
        quotes,
        on=["sym"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["quote"],
        direction="forward",
    )
    got = {r["trade_id"]: r["quote"] for r in out.collect()}
    assert got == {
        1: None,  # no quote at/after 10:00:05
        2: 99.5,  # equal timestamps match (>= semantics, mirrored)
        3: 99.5,  # earliest following quote
        4: None,  # B's only quote precedes the trade
        5: None,  # key never quoted
    }
    assert out.count() == trades.count()


def test_asof_forward_tolerance(spark):
    trades, quotes = _fixtures(spark)
    out = asof_join(
        trades,
        quotes,
        on=["sym"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["quote"],
        direction="forward",
        tolerance=F.expr("INTERVAL 30 SECONDS"),
    )
    got = {r["trade_id"]: r["quote"] for r in out.collect()}
    # trade 3 (09:59:00): next quote 10:00:00 is 60 s away — voided
    assert got[3] is None
    assert got[2] == 99.5


def test_asof_rejects_bad_direction(spark):
    trades, quotes = _fixtures(spark)
    try:
        asof_join(
            trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
            value_cols=["quote"], direction="nearest",
        )
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
