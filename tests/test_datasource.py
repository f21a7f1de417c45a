"""Python Data Source API source: registration, partition planning,
both modes, and agreement with the mapInPandas fetch path."""

from __future__ import annotations

import pytest

from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.api_fetch import (
    fetch_info,
    fetch_stock_history,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.datasource import (
    FinancialApiDataSource,
)

TICKERS = "AAPL,MSFT,GOOG,AMZN,NVDA"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(FinancialApiDataSource)


def test_info_mode_reads_all_tickers(spark):
    df = (
        spark.read.format("financial_api")
        .option("tickers", TICKERS)
        .option("mode", "info")
        .option("numPartitions", "2")
        .load()
    )
    rows = df.collect()
    assert {r["ticker"] for r in rows} == set(TICKERS.split(","))
    assert all(r["fetch_error"] is None for r in rows)
    assert df.rdd.getNumPartitions() == 2


def test_stock_mode_matches_mapinpandas_path(spark):
    ds = (
        spark.read.format("financial_api")
        .option("tickers", TICKERS)
        .option("mode", "stock")
        .load()
    )
    seed = spark.createDataFrame(
        [(t,) for t in TICKERS.split(",")], "ticker_name string"
    )
    mip = fetch_stock_history(seed)
    assert sorted(map(tuple, ds.collect())) == sorted(map(tuple, mip.collect()))


def test_info_mode_matches_mapinpandas_path(spark):
    ds = (
        spark.read.format("financial_api")
        .option("tickers", TICKERS)
        .option("mode", "info")
        .load()
    )
    seed = spark.createDataFrame(
        [(t,) for t in TICKERS.split(",")], "ticker_name string"
    )
    mip = fetch_info(seed)
    assert sorted(map(tuple, ds.collect())) == sorted(map(tuple, mip.collect()))


def test_partition_count_caps_at_tickers(spark):
    df = (
        spark.read.format("financial_api")
        .option("tickers", "AAPL,MSFT")
        .option("numPartitions", "16")
        .load()
    )
    assert df.rdd.getNumPartitions() <= 2
    assert df.count() == 2
