"""SCD2 merge: change closes + reopens, no-op keeps, insert opens,
closed history passes through; reapplying the same batch is a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.scd import scd2_merge

SCHEMA = (
    "ticker string, industry string, employees double, "
    "effective_from string, effective_to string"
)


def _history(spark):
    return spark.createDataFrame(
        [
            ("AAPL", "Tech", 100.0, "2024-01", None),
            ("MSFT", "Tech", 200.0, "2024-01", None),
            ("XOM", "Energy", 300.0, "2023-06", "2024-01"),  # closed row
            ("XOM", "Energy", 310.0, "2024-01", None),
        ],
        SCHEMA,
    )


def test_scd2_change_noop_insert(spark):
    updates = spark.createDataFrame(
        [
            ("AAPL", "Tech", 150.0, "2024-03"),   # changed -> close + reopen
            ("MSFT", "Tech", 200.0, "2024-03"),   # identical -> no-op
            ("NVDA", "Tech", 50.0, "2024-03"),    # new key -> insert open
        ],
        "ticker string, industry string, employees double, effective_from string",
    )
    out = scd2_merge(
        _history(spark), updates, key="ticker", attrs=["industry", "employees"]
    )
    rows = {
        (r["ticker"], r["effective_from"]): (r["employees"], r["effective_to"])
        for r in out.collect()
    }
    assert rows == {
        ("AAPL", "2024-01"): (100.0, "2024-03"),  # closed at change date
        ("AAPL", "2024-03"): (150.0, None),       # new open row
        ("MSFT", "2024-01"): (200.0, None),       # untouched
        ("XOM", "2023-06"): (300.0, "2024-01"),   # closed history intact
        ("XOM", "2024-01"): (310.0, None),
        ("NVDA", "2024-03"): (50.0, None),        # inserted
    }
    # exactly one open row per live key
    opens = out.filter(F.col("effective_to").isNull()).groupBy("ticker").count()
    assert all(r["count"] == 1 for r in opens.collect())


def test_scd2_reapply_is_idempotent(spark):
    updates = spark.createDataFrame(
        [("AAPL", "Tech", 150.0, "2024-03")],
        "ticker string, industry string, employees double, effective_from string",
    )
    once = scd2_merge(
        _history(spark), updates, key="ticker", attrs=["industry", "employees"]
    )
    twice = scd2_merge(once, updates, key="ticker", attrs=["industry", "employees"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
