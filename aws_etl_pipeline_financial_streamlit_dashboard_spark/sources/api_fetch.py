"""Distributed external-API extract source (SURVEY.md §2.1 S4, §2.10).

The reference fetches yfinance serially per ticker on one EC2 box with
linspace batching for memory and try/except per batch
(retrieval.py:133-151, ~30 min for the full list, README.md:18). The
Spark-native shape: the ticker seed DataFrame is repartitioned to the
desired fetch parallelism and each partition runs an Arrow-batched
``mapInPandas`` fetch — N workers fetching concurrently, per-ticker
error isolation instead of per-batch, and the engine handles retries
and partial-result semantics.

Network access doesn't exist in this container, so the fetcher is
injectable: ``fake_fetcher`` produces deterministic reference-shaped
records (same columns yfinance yields after the reference's column
normalization). The distributed plumbing — partitioning, batch
iteration, error rows, schema contract — is the real production path.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

INFO_SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        T.StructField("shortname", T.StringType()),
        T.StructField("website", T.StringType()),
        T.StructField("industry", T.StringType()),
        T.StructField("longbusinesssummary", T.StringType()),
        T.StructField("fulltimeemployees", T.StringType()),
        T.StructField("sharesoutstanding", T.StringType()),
        T.StructField("previousclose", T.StringType()),
        T.StructField("freecashflow", T.StringType()),
        T.StructField("operatingcashflow", T.StringType()),
        T.StructField("dividendyield", T.StringType()),
        T.StructField("trailingpe", T.StringType()),
        T.StructField("debttoequity", T.StringType()),
        T.StructField("returnonassets", T.StringType()),
        T.StructField("returnonequity", T.StringType()),
        T.StructField("fetch_error", T.StringType()),
    ]
)

STOCK_SCHEMA = T.StructType(
    [
        T.StructField("month", T.StringType()),
        T.StructField("ticker", T.StringType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("volume", T.DoubleType()),
        T.StructField("dividends", T.DoubleType()),
        T.StructField("stock_splits", T.DoubleType()),
        T.StructField("fetch_error", T.StringType()),
    ]
)

# A fetcher maps one ticker -> (info_record dict, list of monthly bars).
Fetcher = Callable[[str], tuple[dict, list[dict]]]


def fake_fetcher(ticker: str) -> tuple[dict, list[dict]]:
    """Deterministic stand-in for the yfinance client: stable pseudo
    values derived from the ticker string (no RNG, no network)."""
    h = sum(ord(c) * (i + 1) for i, c in enumerate(ticker)) % 997
    base = 10.0 + (h % 90)
    info = {
        "ticker": ticker,
        "shortname": f"{ticker.title()} Inc",
        "website": f"https://{ticker.lower()}.example.com",
        "industry": ["Tech", "Energy", "Finance", "Health"][h % 4],
        "longbusinesssummary": f"{ticker} synthetic business summary",
        "fulltimeemployees": str(100 + h),
        "sharesoutstanding": str(1000 + 10 * h),
        "previousclose": str(base),
        "freecashflow": str(50 + h % 20),
        "operatingcashflow": str(60 + h % 25),
        "dividendyield": None if h % 3 == 0 else str(round(0.01 + (h % 5) / 100, 4)),
        "trailingpe": str(8 + h % 30),
        "debttoequity": str(round(0.5 + (h % 10) / 10, 2)),
        "returnonassets": str(round(0.02 + (h % 7) / 100, 4)),
        "returnonequity": str(round(0.05 + (h % 9) / 100, 4)),
    }
    bars = []
    for i, month in enumerate(
        f"2024-{m:02d}" for m in range(1, 13)
    ):
        px = base + i * (1 + h % 3)
        bars.append(
            {
                "month": month,
                "ticker": ticker,
                "open": px,
                "close": px + 0.5,
                "high": px + 1.0,
                "low": px - 1.0,
                "volume": float(1000 * (h + i + 1)),
                "dividends": 0.0,
                "stock_splits": 0.0,
            }
        )
    return info, bars


def fetch_info(
    tickers: DataFrame,
    fetcher: Fetcher = fake_fetcher,
    parallelism: int | None = None,
    ticker_col: str = "ticker_name",
) -> DataFrame:
    """Per-ticker snapshot extract (getDescription, retrieval.py:10-25).

    ``repartition(parallelism)`` replaces the reference's linspace RAM
    batching (retrieval.py:133-137): fetch concurrency == partition
    count, each worker holds only its partition. Failures isolate
    per-ticker into ``fetch_error`` rows (vs the reference's
    skip-a-whole-batch try/except, retrieval.py:140-151).
    """
    src = tickers.select(F.upper(F.col(ticker_col)).alias("ticker"))
    if parallelism:
        src = src.repartition(parallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in INFO_SCHEMA.fields]
        for pdf in batches:
            out = []
            for t in pdf["ticker"]:
                try:
                    info, _ = fetcher(t)
                    out.append({**info, "fetch_error": None})
                except Exception as exc:  # per-ticker isolation
                    out.append({"ticker": t, "fetch_error": repr(exc)})
            yield pd.DataFrame(out, columns=cols)

    return src.mapInPandas(run, schema=INFO_SCHEMA)


def fetch_stock_history(
    tickers: DataFrame,
    fetcher: Fetcher = fake_fetcher,
    parallelism: int | None = None,
    ticker_col: str = "ticker_name",
) -> DataFrame:
    """Per-ticker monthly-bar history extract (getStock,
    retrieval.py:27-47): one output row per (ticker, month)."""
    src = tickers.select(F.upper(F.col(ticker_col)).alias("ticker"))
    if parallelism:
        src = src.repartition(parallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in STOCK_SCHEMA.fields]
        for pdf in batches:
            out = []
            for t in pdf["ticker"]:
                try:
                    _, bars = fetcher(t)
                    out.extend({**b, "fetch_error": None} for b in bars)
                except Exception as exc:
                    out.append({"ticker": t, "fetch_error": repr(exc)})
            yield pd.DataFrame(out, columns=cols)

    return src.mapInPandas(run, schema=STOCK_SCHEMA)
