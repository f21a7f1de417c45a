"""Round-4 regression tests (VERDICT r3 items 1, 3, 7, 8).

Covers the driver-environment hardening of the financial family —
epoch-derived day/month keys, BIGINT-cast volume sums — plus the
q54/q64 broadcast-hint removal and the session-timezone invariant the
verify skill previously documented as machine luck.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.functions.scalars import (
    sql_day_from_us_duckdb,
    sql_day_from_us_spark,
    sql_month_from_us_duckdb,
    sql_month_from_us_spark,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import QUERIES
from tests.conftest import assert_frames_match


# Epoch-micros values probing calendar edges: epoch itself, last/first
# micro of a day, leap-day, leap-year Feb 28 → Mar 1, century
# non-leap-like 2000 (which IS a leap year), year boundaries, and a
# far future date.
_EDGE_US = [
    0,
    1,
    86_399_999_999,
    86_400_000_000,
    951_782_399_999_999,  # 2000-02-28 23:59:59.999999
    951_782_400_000_000,  # 2000-02-29 (leap century)
    1_078_012_800_000_000,  # 2004-02-29
    1_704_067_199_999_999,  # 2023-12-31 23:59:59.999999
    1_704_067_200_000_000,  # 2024-01-01
    4_102_444_800_000_000,  # 2100-01-01 (non-leap century ahead)
]


def test_day_month_from_us_matches_duckdb_on_calendar_edges(spark):
    """The Spark and DuckDB texts of the epoch-derived day/month keys
    must agree cell-for-cell on calendar edge cases — this equality is
    what lets the financial oracles drop date_format/STRFTIME."""
    sdf = spark.createDataFrame([(u,) for u in _EDGE_US], "us long").select(
        F.expr(sql_day_from_us_spark("us")).alias("day"),
        F.expr(sql_month_from_us_spark("us")).alias("month"),
    )
    got = [(r.day, r.month) for r in sdf.collect()]
    con = duckdb.connect()
    want = []
    for u in _EDGE_US:
        d, m = con.sql(
            f"SELECT {sql_day_from_us_duckdb(str(u))},"
            f" {sql_month_from_us_duckdb(str(u))}"
        ).fetchone()
        want.append((d, m))
    assert got == want
    # and the derivation equals what a UTC strftime would have produced
    want_strftime = [
        con.sql(
            f"SELECT STRFTIME(make_timestamp({u}), '%Y-%m-%d'),"
            f" STRFTIME(make_timestamp({u}), '%Y-%m')"
        ).fetchone()
        for u in _EDGE_US
    ]
    assert got == [tuple(w) for w in want_strftime]


# Entries that bucket facts by a day/month key derived from a raw
# timestamp — the surface a session-timezone delta could corrupt.
_TZ_SENSITIVE = [
    "q08_monthly_avg_series",
    "q12_month_display_format",
    "q52_max_drawdown",
    "q53_ewma_smoothing",
    "q54_symbol_correlation",
    "q55_ohlc_candles",
    "q56_vwap",
    "q57_returns_volatility",
    "q60_bollinger_bands",
    "q61_tick_rule_imbalance",
    "q62_twap",
    "q64_lead_lag_correlation",
    # 6-hour bucket labels rendered from an arithmetic LTZ value —
    # caught rendering through the session zone by the round-5
    # full-catalog shifted-TZ sweep (Asia/Kolkata, +5:30)
    "q47_windowed_percentiles",
    # Streaming entries that bucket or emit event time through the
    # watermark path (VERDICT r4 item 5): these run REAL streaming
    # queries, where a plain NTZ->LTZ cast would move window
    # boundaries and epoch outputs with the session zone —
    # scalars.event_time / ntz_of_instant pin them.
    "s09_stream_stream_join",
    "s10_stream_stream_left_join",
    "s12_streaming_ohlc",
    "s13_streaming_ohlc_append",
    "s15_streaming_session_window",
]


@pytest.mark.parametrize("name", _TZ_SENSITIVE)
def test_oracle_parity_under_shifted_session_timezone(
    spark, duck, sf_dir, name
):
    """VERDICT r3 item 8: date-bucketing entries must match the oracle
    even when the Spark session timezone is NOT the machine/oracle
    zone — the invariant that makes the catalog immune to whatever
    zone the driver harness runs under."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        spec = QUERIES[name]
        assert_frames_match(spec.spark(spark, sf_dir), duck.sql(spec.oracle), name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_fin_volume_oracles_emit_no_hugeint(duck):
    """The r3 driver hash mismatch reproduced as DuckDB typing a bare
    SUM(BIGINT) as HUGEINT, which pandas/Arrow fetch paths degrade to
    float64. Every oracle output column must stay out of HUGEINT (and
    out of DECIMAL, same failure shape) so no fetch path can change
    the value's printed form."""
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            continue
        rel = duck.sql(spec.oracle)
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t) in ("HUGEINT", "UHUGEINT") or str(t).startswith("DECIMAL")
        ]
        assert not bad, f"{name}: oracle outputs fetch-fragile types {bad}"


@pytest.mark.parametrize(
    "name", ["q54_symbol_correlation", "q64_lead_lag_correlation"]
)
def test_correlation_joins_run_on_aggregates_only(spark, sf_dir, name):
    """VERDICT r3 item 3: the forced broadcasts are gone; the plan must
    still do its fact-scale work exactly once (the daily aggregate is
    checkpointed, so the visible plan has NO parquet scan — the events
    scan + partial agg ran once at checkpoint time) and the self-join
    must run on the aggregated daily rows, picked by the engine's size
    policy (broadcast at this scale; partitioned-on-day when
    |symbols|×|days| outgrows the threshold)."""
    df = QUERIES[name].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan, "fact scan leaked past the checkpoint"
    # Both join inputs must come from the checkpointed RDD (≥2 RDD
    # scans — exact count is a rendering detail across Spark versions)
    assert plan.count("Scan ExistingRDD") >= 2
    # A join must exist; WHICH physical join is a size-policy outcome,
    # so only assert broadcast when the fixture is actually under the
    # session's broadcast threshold (it is at test scale).
    assert "Join" in plan
    # Tolerate Spark's byte-suffixed conf forms ('64MB', '10485760b'):
    # an unparseable threshold skips the size-policy assert rather than
    # erroring the test.
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        threshold = int(raw)
    except ValueError:
        m = re.fullmatch(r"(\d+)\s*([kmgt]?)b?", raw.strip().lower())
        if not m:
            return
        threshold = int(m.group(1)) * 1024 ** " kmgt".index(m.group(2) or " ")
    fixture_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet") and os.path.isfile(os.path.join(sf_dir, f))
    )
    if 0 < fixture_bytes < threshold:
        assert "BroadcastHashJoin" in plan
