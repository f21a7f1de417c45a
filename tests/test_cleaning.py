"""Known-answer tests for the transform pipeline (plans/cleaning.py)
against the reference's cleaning.py semantics (SURVEY.md §5.2)."""

from __future__ import annotations

import math

import pytest

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.cleaning import (
    build_company_info,
    build_financial_statements,
    build_ratios,
    build_stock_price,
    run_transform,
)
from tests.fixtures import raw_financials, raw_info, raw_stock


@pytest.fixture(scope="module")
def serving(spark):
    return run_transform(raw_info(spark), raw_stock(spark), raw_financials(spark))


def by_ticker(df, ticker):
    return {r["ticker"]: r for r in df.collect()}.get(ticker)


def test_company_info_schema_and_cast(serving):
    ci = serving["company_info"]
    assert ci.columns == [
        "ticker", "company_nm", "website", "industry", "company_info",
        "full_time_employees",
    ]
    assert dict(ci.dtypes)["full_time_employees"] == "double"
    row = by_ticker(ci, "AAA")
    assert row["company_nm"] == "Alpha Inc"
    assert row["full_time_employees"] == 100.0
    # null numeric-string stays null after cast (DDD)
    assert by_ticker(ci, "DDD")["full_time_employees"] is None


def test_stock_price_projection(serving):
    sp = serving["stock_price"]
    assert sp.columns == [
        "ticker", "month", "opening_price", "closing_price", "month_high",
        "month_low",
    ]
    # volume/dividends noise columns projected away; month stays a string
    assert dict(sp.dtypes)["month"] == "string"
    assert sp.filter("ticker = 'EEE'").count() == 2  # gap preserved


def test_financials_latest_quarter_argmax(serving):
    fs = serving["financial_statements"]
    # AAA reduced to its 2024-03 quarter
    assert by_ticker(fs, "AAA")["cash_and_cash_equivalents"] == 120.0
    # BBB keeps BOTH rows tied on max month (reference inner-join keeps ties)
    assert fs.filter("ticker = 'BBB'").count() == 2
    # month column dropped (cleaning.py:63)
    assert "month" not in fs.columns


def test_current_ratio_divide_by_zero_is_null(serving):
    fs = serving["financial_statements"]
    ccc = by_ticker(fs, "CCC")
    assert ccc["current_ratio"] is None  # 80/0 → NULL (pinned deviation)
    aaa = by_ticker(fs, "AAA")
    assert aaa["current_ratio"] == pytest.approx(2.0)


def test_ratios_derivations_and_left_join(serving):
    r = serving["ratios"]
    aaa = by_ticker(r, "AAA")
    assert aaa["market_cap"] == pytest.approx(1000 * 10.0)
    # ev_to_ebitda = (mcap + debt − cash)/ebitda = (10000+55−120)/45
    assert aaa["ev_to_ebitda"] == pytest.approx((10000 + 55 - 120) / 45)
    # CCC: ebitda 0 → NULL ev_to_ebitda
    assert by_ticker(r, "CCC")["ev_to_ebitda"] is None
    # FFF exists only in financials → not in ratios (driven off info)
    assert by_ticker(r, "FFF") is None
    # left-join: every info ticker present even with financials nulls;
    # BBB's two tied latest-quarter rows fan out through the join (the
    # reference's pandas merge duplicates identically)
    assert r.count() == 6
    assert r.filter("ticker = 'BBB'").count() == 2


def test_run_transform_is_deterministic(serving, spark):
    again = run_transform(raw_info(spark), raw_stock(spark), raw_financials(spark))
    for name, df in serving.items():
        a = sorted([tuple(r) for r in df.collect()], key=repr)
        b = sorted([tuple(r) for r in again[name].collect()], key=repr)
        assert a == b, name
