"""The reference's six dashboard queries (Frontend.py:28-97) as Spark
plans over the curated serving tables (SURVEY.md §3 entry point 3).

The reference round-trips to Postgres per query and post-processes in
pandas (positional join, index relabel, transpose). Here each user
interaction is ONE lazy plan: the data-dependent industry lookup folds
into a join, and the pandas reshape becomes label columns + unpivot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.functions.scalars import (
    month_display,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.core import (
    union_align,
    unpivot_metrics,
    with_label_column,
)

# The 12 AVG metrics of the industry-comparison query (Frontend.py:60-69).
INDUSTRY_AVG_COLS = [
    "cash_and_cash_equivalents",
    "ebitda",
    "net_income",
    "net_debt",
    "current_ratio",
    "free_cash_flow",
    "operating_cash_flow",
    "debt_to_equity",
    "return_on_assets",
    "return_on_equity",
    "ev_to_ebitda",
    "trailing_pe",
]

STATEMENT_METRICS = [
    "cash_and_cash_equivalents",
    "ebitda",
    "net_income",
    "net_debt",
    "current_ratio",
]

RATIO_METRICS = [
    "free_cash_flow",
    "operating_cash_flow",
    "debt_to_equity",
    "return_on_assets",
    "return_on_equity",
    "ev_to_ebitda",
    "trailing_pe",
]


def _upper(ticker: str) -> str:
    # case-insensitive ticker contract (Frontend.py:23, retrieval.py:78)
    return ticker.upper()


def point_lookup(table: DataFrame, ticker: str) -> DataFrame:
    """P4: ``SELECT * FROM <t> WHERE ticker = ?`` (Frontend.py:28-55)."""
    return table.filter(F.col("ticker") == _upper(ticker))


def company_header(company_info: DataFrame, ticker: str) -> DataFrame:
    """P6: the one-row company header (Frontend.py:28-37)."""
    return point_lookup(company_info, ticker).select(
        "ticker", "company_nm", "website", "industry", "company_info"
    ).limit(1)


def industry_averages(
    company_info: DataFrame,
    financial_statements: DataFrame,
    ratios: DataFrame,
    ticker: str,
) -> DataFrame:
    """The 12-AVG industry aggregate over the 3-way left-join chain
    (Frontend.py:60-69), with the data-dependent industry lookup
    (Frontend.py:28-32 → 67) folded in as a join instead of a second
    client round-trip: one plan, one shuffle past the broadcast joins."""
    joined = company_info.select("ticker", "industry").join(
        financial_statements, "ticker", "left"
    ).join(ratios.drop("current_ratio"), "ticker", "left")
    target_industry = (
        company_info.filter(F.col("ticker") == _upper(ticker))
        .select(F.col("industry").alias("__target_industry"))
        .limit(1)
    )
    return (
        joined.join(
            F.broadcast(target_industry),
            joined.industry == F.col("__target_industry"),
            "inner",
        )
        .groupBy("industry")
        .agg(*[F.avg(c).alias(c) for c in INDUSTRY_AVG_COLS])
    )


def industry_price_series(
    company_info: DataFrame, stock_price: DataFrame, ticker: str
) -> DataFrame:
    """Industry monthly average closing price, chronologically ordered by
    the 'YYYY-MM' string key (Frontend.py:71-79 + the display format at
    Frontend.py:81-82)."""
    target_industry = (
        company_info.filter(F.col("ticker") == _upper(ticker))
        .select(F.col("industry").alias("__target_industry"))
        .limit(1)
    )
    return (
        company_info.select("ticker", "industry")
        .join(stock_price, "ticker", "left")
        .join(
            F.broadcast(target_industry),
            F.col("industry") == F.col("__target_industry"),
            "inner",
        )
        .groupBy("month")
        .agg(F.avg("closing_price").alias("avg_closing_price"))
        .orderBy("month")
        .withColumn("month_display", month_display(F.col("month")))
    )


def company_price_series(stock_price: DataFrame, ticker: str) -> DataFrame:
    """Company monthly price series (Frontend.py:51-58)."""
    return (
        point_lookup(stock_price, ticker)
        .orderBy("month")
        .withColumn("month_display", month_display(F.col("month")))
    )


def comparison_table(
    company_info: DataFrame,
    financial_statements: DataFrame,
    ratios: DataFrame,
    ticker: str,
) -> DataFrame:
    """Company-vs-industry-average long table (Frontend.py:84-97).

    The reference's pandas choreography — positional join (J7), index
    relabel (R4), union-align (U2), transpose ×2 (R2) — re-expressed
    relationally: label column + unionByName + unpivot. Output is
    (label, metric, value): exactly the long form the reference's
    transposed frames feed to the bar charts."""
    t = _upper(ticker)
    company_row = (
        point_lookup(financial_statements, t)
        .join(point_lookup(ratios.drop("current_ratio"), t), "ticker", "left")
        .limit(1)
    )
    company_labeled = with_label_column(company_row.drop("ticker"), t, "label")
    industry_avg = industry_averages(
        company_info, financial_statements, ratios, t
    ).drop("industry")
    industry_labeled = with_label_column(industry_avg, "Industry Average", "label")
    both = union_align(company_labeled, industry_labeled)
    metrics = [c for c in both.columns if c != "label"]
    return unpivot_metrics(both, ["label"], metrics)
