"""Known-answer tests for the dashboard query layer (plans/dashboard.py)
against the reference Frontend.py semantics (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.cleaning import (
    run_transform,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.dashboard import (
    INDUSTRY_AVG_COLS,
    company_header,
    company_price_series,
    comparison_table,
    industry_averages,
    industry_price_series,
    point_lookup,
)
from tests.fixtures import raw_financials, raw_info, raw_stock


@pytest.fixture(scope="module")
def serving(spark):
    return run_transform(raw_info(spark), raw_stock(spark), raw_financials(spark))


def test_point_lookup_case_insensitive(serving):
    rows = point_lookup(serving["company_info"], "aaa").collect()
    assert len(rows) == 1 and rows[0]["ticker"] == "AAA"
    # queried ticker absent everywhere → empty result, no error
    assert point_lookup(serving["company_info"], "ZZZ").count() == 0


def test_company_header_single_row(serving):
    row = company_header(serving["company_info"], "AAA").collect()
    assert len(row) == 1
    assert row[0]["company_nm"] == "Alpha Inc"


def test_industry_averages_null_skipping(serving):
    out = industry_averages(
        serving["company_info"],
        serving["financial_statements"],
        serving["ratios"],
        "aaa",
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row["industry"] == "Tech"
    assert set(INDUSTRY_AVG_COLS) <= set(out[0].asDict())
    # Tech = AAA (1 row) + BBB (2 tied latest-quarter rows, which fan
    # out to 4 via the ratios join — the reference's pandas merges
    # duplicate identically) + DDD (no financials → nulls skipped):
    # AVG(ebitda) over {45, 80, 80, 81, 81}
    assert row["ebitda"] == pytest.approx((45 + 80 + 80 + 81 + 81) / 5)
    # trailing_pe from ratios: {15, 22×4, 9} (DDD has pe 9)
    assert row["trailing_pe"] == pytest.approx((15 + 22 * 4 + 9) / 6)


def test_single_ticker_industry(serving):
    out = industry_averages(
        serving["company_info"],
        serving["financial_statements"],
        serving["ratios"],
        "CCC",
    ).collect()
    assert len(out) == 1
    assert out[0]["ebitda"] == pytest.approx(0.0)  # AVG over one row
    assert out[0]["ev_to_ebitda"] is None  # NULL input → NULL avg


def test_industry_price_series_chronological(serving):
    out = industry_price_series(
        serving["company_info"], serving["stock_price"], "AAA"
    ).collect()
    months = [r["month"] for r in out]
    # DDD (Tech, no stock rows) contributes a NULL-month group through
    # the left join — same as the reference's SQL; NULLS FIRST in Spark
    non_null = [m for m in months if m is not None]
    assert non_null == sorted(non_null)  # string sort == chronological
    # Tech prices = AAA and BBB series (DDD absent from stock_price)
    first = next(r for r in out if r["month"] == "2023-11")
    assert first["avg_closing_price"] == pytest.approx((10.5 + 20.5) / 2)
    assert first["month_display"] == "Nov 2023"


def test_company_price_series_display_format(serving):
    out = company_price_series(serving["stock_price"], "eee").collect()
    assert [r["month_display"] for r in out] == ["Nov 2023", "Feb 2024"]


def test_comparison_table_long_form(serving):
    out = comparison_table(
        serving["company_info"],
        serving["financial_statements"],
        serving["ratios"],
        "AAA",
    )
    rows = out.collect()
    labels = {r["label"] for r in rows}
    assert labels == {"AAA", "Industry Average"}
    # long form: one row per (label, metric)
    metrics = {r["metric"] for r in rows}
    assert set(INDUSTRY_AVG_COLS) <= metrics
    by_key = {(r["label"], r["metric"]): r["value"] for r in rows}
    assert by_key[("AAA", "ebitda")] == pytest.approx(45.0)
    assert by_key[("Industry Average", "ebitda")] == pytest.approx(
        (45 + 80 + 80 + 81 + 81) / 5
    )
