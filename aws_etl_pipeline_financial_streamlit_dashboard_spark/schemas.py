"""Explicit schemas for every table the engine touches.

The reference infers schemas dynamically then normalizes to a fixed
contract via per-table ``column_mapping`` dicts (cleaning.py:21-79); here
the contract is explicit ``StructType``s (SURVEY.md §1.3-1.4). Two schema
families:

1. The reference's curated serving tables (cleaning.py outputs,
   SURVEY.md §1.1) — used by the transform pipeline + dashboard queries.
2. The driver testdata star schema (TESTDATA.md) — used by the
   oracle-differential query catalog and bench.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# 1. Reference serving schemas (cleaning.py:21-88; SURVEY.md §1.1)
# --------------------------------------------------------------------------

COMPANY_INFO = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        T.StructField("company_nm", T.StringType()),
        T.StructField("website", T.StringType()),
        T.StructField("industry", T.StringType()),
        T.StructField("company_info", T.StringType()),
        T.StructField("full_time_employees", T.DoubleType()),
    ]
)

STOCK_PRICE = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        # "YYYY-MM" string by design: lexical sort == chronological sort
        # (retrieval.py:44, Frontend.py:78; SURVEY.md §1.2).
        T.StructField("month", T.StringType()),
        T.StructField("opening_price", T.DoubleType()),
        T.StructField("closing_price", T.DoubleType()),
        T.StructField("month_high", T.DoubleType()),
        T.StructField("month_low", T.DoubleType()),
    ]
)

FINANCIAL_STATEMENTS = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        T.StructField("cash_and_cash_equivalents", T.DoubleType()),
        T.StructField("ebitda", T.DoubleType()),
        T.StructField("net_income", T.DoubleType()),
        T.StructField("net_debt", T.DoubleType()),
        T.StructField("total_debt", T.DoubleType()),
        T.StructField("current_assets", T.DoubleType()),
        T.StructField("current_liabilities", T.DoubleType()),
        T.StructField("current_ratio", T.DoubleType()),
    ]
)

RATIOS = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        T.StructField("outstanding_shares", T.DoubleType()),
        T.StructField("latest_closing_price", T.DoubleType()),
        T.StructField("free_cash_flow", T.DoubleType()),
        T.StructField("operating_cash_flow", T.DoubleType()),
        T.StructField("dividend_yield", T.DoubleType()),
        T.StructField("trailing_pe", T.DoubleType()),
        T.StructField("debt_to_equity", T.DoubleType()),
        T.StructField("return_on_assets", T.DoubleType()),
        T.StructField("return_on_equity", T.DoubleType()),
        T.StructField("market_cap", T.DoubleType()),
        T.StructField("current_ratio", T.DoubleType()),
        T.StructField("ev_to_ebitda", T.DoubleType()),
    ]
)

SERVING_SCHEMAS: dict[str, T.StructType] = {
    "company_info": COMPANY_INFO,
    "stock_price": STOCK_PRICE,
    "financial_statements": FINANCIAL_STATEMENTS,
    "ratios": RATIOS,
}

# Column-mapping contracts mirroring cleaning.py's select-and-rename
# projections (cleaning.py:21-28, 33-40, 45-55, 66-77). Keys are the raw
# (normalized) source columns, values the serving names.
COMPANY_INFO_MAPPING = {
    "ticker": "ticker",
    "shortname": "company_nm",
    "website": "website",
    "industry": "industry",
    "longbusinesssummary": "company_info",
    "fulltimeemployees": "full_time_employees",
}

STOCK_PRICE_MAPPING = {
    "ticker": "ticker",
    "month": "month",
    "open": "opening_price",
    "close": "closing_price",
    "high": "month_high",
    "low": "month_low",
}

FINANCIAL_STATEMENTS_MAPPING = {
    "ticker": "ticker",
    "month": "month",
    "cash_and_cash_equivalents": "cash_and_cash_equivalents",
    "ebitda": "ebitda",
    "net_income": "net_income",
    "net_debt": "net_debt",
    "total_debt": "total_debt",
    "current_assets": "current_assets",
    "current_liabilities": "current_liabilities",
}

RATIOS_MAPPING = {
    "ticker": "ticker",
    "sharesoutstanding": "outstanding_shares",
    "previousclose": "latest_closing_price",
    "freecashflow": "free_cash_flow",
    "operatingcashflow": "operating_cash_flow",
    "dividendyield": "dividend_yield",
    "trailingpe": "trailing_pe",
    "debttoequity": "debt_to_equity",
    "returnonassets": "return_on_assets",
    "returnonequity": "return_on_equity",
}

# --------------------------------------------------------------------------
# 2. Driver testdata star schema (TESTDATA.md)
# --------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always be broadcast in joins at any scale.
BROADCAST_DIMS = frozenset({"region", "nation"})

_IDENT_RE = re.compile(r"[^a-z0-9_]")


def normalize_column_name(name: str) -> str:
    """SQL-identifier hygiene applied by the reference to every source
    column (retrieval.py:23,45,64; SURVEY.md §2.8 F1): lowercase,
    spaces→underscore, strip anything outside [a-z0-9_]."""
    return _IDENT_RE.sub("", name.lower().replace(" ", "_"))


def normalize_columns(df):
    """Rename every column of ``df`` through :func:`normalize_column_name`.

    Schema-level rename only — no data movement, no shuffle.
    """
    return df.toDF(*[normalize_column_name(c) for c in df.columns])
