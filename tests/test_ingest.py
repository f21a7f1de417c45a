"""Tests for the distributed extract layer (sources/api_fetch.py) and
sinks: the Spark-native retrieval.py (SURVEY.md §2.1 S4, §2.10 B1-B3)
with a mocked fetcher, including per-ticker error isolation and
idempotent overwrite."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.cleaning import (
    run_transform,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.api_fetch import (
    fake_fetcher,
    fetch_info,
    fetch_stock_history,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.sinks import (
    write_marker,
    write_parquet_overwrite,
)


@pytest.fixture(scope="module")
def tickers(spark):
    # lowercase entries exercise the uppercase contract (retrieval.py:78)
    return spark.createDataFrame(
        [("aaa",), ("BBB",), ("ccc",), ("DDD",), ("eee",), ("BOOM",)],
        ["ticker_name"],
    )


def test_fetch_info_distributed(spark, tickers):
    df = fetch_info(tickers, parallelism=3)
    rows = {r["ticker"]: r for r in df.collect()}
    assert set(rows) == {"AAA", "BBB", "CCC", "DDD", "EEE", "BOOM"}
    assert rows["AAA"]["shortname"] == "Aaa Inc"
    assert all(r["fetch_error"] is None for r in rows.values())
    # stringly-typed contract (retrieval.py:19)
    assert dict(df.dtypes)["fulltimeemployees"] == "string"


def test_fetch_error_isolation(spark, tickers):
    def flaky(t):
        if t == "BOOM":
            raise RuntimeError("api down")
        return fake_fetcher(t)

    df = fetch_info(tickers, fetcher=flaky, parallelism=2)
    rows = {r["ticker"]: r for r in df.collect()}
    # one bad ticker doesn't lose the rest (vs reference's whole-batch skip)
    assert rows["BOOM"]["fetch_error"] is not None
    assert rows["BOOM"]["shortname"] is None
    ok = [t for t, r in rows.items() if r["fetch_error"] is None]
    assert len(ok) == 5


def test_fetch_stock_history_shape(spark, tickers):
    df = fetch_stock_history(tickers, parallelism=2)
    assert df.filter(F.col("ticker") == "AAA").count() == 12  # monthly bars
    months = [
        r["month"]
        for r in df.filter("ticker = 'AAA'").select("month").orderBy("month").collect()
    ]
    assert months == sorted(months) and months[0] == "2024-01"


def test_extract_to_transform_end_to_end(spark, tickers):
    """Full extract→transform: fetched raw tables flow through
    run_transform (the retrieval.py → cleaning.py pipeline seam)."""
    info_raw = fetch_info(tickers, parallelism=2).filter(
        F.col("fetch_error").isNull()
    ).drop("fetch_error")
    stock_raw = fetch_stock_history(tickers, parallelism=2).filter(
        F.col("fetch_error").isNull()
    ).drop("fetch_error")
    # minimal financials via the info fetcher's deterministic values
    fin_raw = spark.createDataFrame(
        [("2024-03", t, 10.0, 5.0, 1.0, 2.0, 3.0, 20.0, 10.0) for t in
         ["AAA", "BBB", "CCC", "DDD", "EEE", "BOOM"]],
        ["month", "ticker", "cash_and_cash_equivalents", "ebitda", "net_income",
         "net_debt", "total_debt", "current_assets", "current_liabilities"],
    )
    serving = run_transform(info_raw, stock_raw, fin_raw)
    assert serving["company_info"].count() == 6
    assert serving["stock_price"].count() == 6 * 12
    assert serving["ratios"].filter("market_cap IS NULL").count() == 0


def test_overwrite_idempotence_and_marker(spark, tickers):
    """B3/S9: writing twice ≡ writing once; marker file written."""
    d = tempfile.mkdtemp(prefix="sink_test_")
    try:
        path = os.path.join(d, "info")
        df = fetch_info(tickers, parallelism=2)
        write_parquet_overwrite(df, path)
        write_parquet_overwrite(df, path)  # overwrite, not append
        assert spark.read.parquet(path).count() == 6
        assert os.path.exists(os.path.join(path, "_SUCCESS"))
        marker = os.path.join(d, "extract_step_completed.txt")
        stamp = write_marker(marker, "extract")
        assert os.path.exists(marker) and "extract" in stamp
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_upsert_partitions_touches_only_written_months(spark, tmp_path):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.sinks import (
        upsert_partitions,
    )

    path = str(tmp_path / "monthly")
    base = spark.createDataFrame(
        [("2024-01", "AAPL", 1.0), ("2024-01", "MSFT", 2.0), ("2024-02", "AAPL", 3.0)],
        "month string, ticker string, px double",
    )
    upsert_partitions(base, path, ["month"])

    # refresh only 2024-02 with corrected data
    fix = spark.createDataFrame(
        [("2024-02", "AAPL", 30.0), ("2024-02", "MSFT", 40.0)],
        "month string, ticker string, px double",
    )
    upsert_partitions(fix, path, ["month"])

    got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert got == [
        ("AAPL", 1.0, "2024-01"),
        ("AAPL", 30.0, "2024-02"),
        ("MSFT", 2.0, "2024-01"),
        ("MSFT", 40.0, "2024-02"),
    ]
