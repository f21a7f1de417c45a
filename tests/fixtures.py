"""Deterministic reference-shaped fixtures (FIXTURES.md §2-4) with the
edge cases the correctness tests depend on: argmax ties, single-quarter
tickers, a ticker absent from info, nulls inside AVG inputs, zero
denominators, and unused noise columns that must be projected away."""

from __future__ import annotations

from pyspark.sql import SparkSession


def raw_info(spark: SparkSession):
    cols = [
        "Ticker",
        "ShortName",
        "Website",
        "Industry",
        "LongBusinessSummary",
        "FullTimeEmployees",
        "SharesOutstanding",
        "PreviousClose",
        "FreeCashflow",
        "OperatingCashflow",
        "DividendYield",
        "TrailingPE",
        "DebtToEquity",
        "ReturnOnAssets",
        "ReturnOnEquity",
        "Noise Field One",  # must be projected away
        "Noise-Field/Two",
    ]
    rows = [
        # AAA/BBB share an industry (Tech); CCC is a 1-ticker industry;
        # DDD has nulls in ratio inputs; EEE pays no dividend.
        ("AAA", "Alpha Inc", "a.com", "Tech", "alpha co", "100", "1000", "10.0",
         "50", "80", "0.02", "15", "1.2", "0.08", "0.15", "x", "y"),
        ("BBB", "Beta Corp", "b.com", "Tech", "beta co", "200", "2000", "20.0",
         "-30", "60", None, "22", "0.8", "0.05", "0.10", "x", "y"),
        ("CCC", "Gamma LLC", None, "Energy", "gamma co", "0", "500", "40.0",
         "10", "12", "0.05", None, "2.0", "0.03", "0.07", "x", "y"),
        ("DDD", "Delta Ltd", "d.com", "Tech", "delta co", None, "800", "5.0",
         None, None, "0.01", "9", None, "0.02", "0.04", "x", "y"),
        ("EEE", "Eps SA", "e.com", "Finance", "eps co", "50", "100", "7.5",
         "5", "6", None, "11", "0.5", "0.06", "0.12", "x", "y"),
    ]
    return spark.createDataFrame(rows, cols)


def raw_stock(spark: SparkSession):
    cols = ["Month", "Ticker", "Open", "Close", "High", "Low", "Volume",
            "Dividends", "Stock Splits"]
    rows = []
    for i, month in enumerate(["2023-11", "2023-12", "2024-01", "2024-02"]):
        for t, base in [("AAA", 10.0), ("BBB", 20.0), ("CCC", 40.0)]:
            px = base + i
            rows.append((month, t, px, px + 0.5, px + 1.0, px - 1.0, 1e6, 0.0, 0.0))
    # EEE has a gap (only two months); DDD absent from stock_price entirely
    rows += [
        ("2023-11", "EEE", 7.0, 7.2, 7.5, 6.9, 5e5, 0.0, 0.0),
        ("2024-02", "EEE", 7.4, 7.6, 7.9, 7.3, 5e5, 0.0, 0.0),
    ]
    return spark.createDataFrame(rows, cols)


def raw_financials(spark: SparkSession):
    cols = ["Month", "Ticker", "Cash And Cash Equivalents", "EBITDA",
            "Net Income", "Net Debt", "Total Debt", "Current Assets",
            "Current Liabilities", "Noise Stat"]
    rows = [
        # AAA: three quarters; latest 2024-03 wins the argmax
        ("2023-09", "AAA", 100.0, 40.0, 10.0, 20.0, 60.0, 200.0, 100.0, 1.0),
        ("2023-12", "AAA", 110.0, 42.0, 11.0, 18.0, 58.0, 210.0, 105.0, 1.0),
        ("2024-03", "AAA", 120.0, 45.0, 12.0, 15.0, 55.0, 220.0, 110.0, 1.0),
        # BBB: TWO rows tie on the max month (argmax keeps both,
        # cleaning.py:62-63 inner-join semantics)
        ("2023-12", "BBB", 200.0, 0.0, -5.0, 90.0, 150.0, 300.0, 0.0, 1.0),
        ("2024-03", "BBB", 210.0, 80.0, -4.0, 85.0, 140.0, 310.0, 155.0, 1.0),
        ("2024-03", "BBB", 215.0, 81.0, -3.0, 84.0, 139.0, 311.0, 156.0, 1.0),
        # CCC: single quarter, zero EBITDA (ev_to_ebitda → NULL) and
        # zero current liabilities (current_ratio → NULL)
        ("2024-03", "CCC", 50.0, 0.0, 2.0, 5.0, 10.0, 80.0, 0.0, 1.0),
        # FFF: present in financials but absent from info (left-join edge)
        ("2024-03", "FFF", 10.0, 5.0, 1.0, 2.0, 3.0, 20.0, 10.0, 1.0),
        # EEE: nulls in measure columns propagate
        ("2024-03", "EEE", None, 12.0, 3.0, 1.0, None, 40.0, 20.0, 1.0),
    ]
    return spark.createDataFrame(rows, cols)
