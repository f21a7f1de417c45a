"""Spark 4 Python Data Source API wrapper for the external financial
API extract (SURVEY.md §2.1 S4 — the reference's yfinance fetch,
retrieval.py:10-66).

Where ``sources/api_fetch.py`` drives the fetch through ``mapInPandas``
over a ticker DataFrame, this module registers a first-class source:

    spark.dataSource.register(FinancialApiDataSource)
    df = (spark.read.format("financial_api")
          .option("tickers", "AAPL,MSFT,GOOG")
          .option("mode", "stock")           # or "info"
          .option("numPartitions", "8")
          .load())

Being a real DataSource means the catalog/reader stack owns it: schema
is declared up front, partitions are planned by the engine (one fetch
task per partition, the distributed replacement for the reference's
serial linspace batching, retrieval.py:133-146), and downstream ops
compose like any other scan.

The fetcher is the deterministic fake (no network in this container);
the partition planning, per-partition iteration, and schema contract
are the production shape.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.api_fetch import (
    INFO_SCHEMA,
    STOCK_SCHEMA,
    fake_fetcher,
)


class _TickerPartition(InputPartition):
    def __init__(self, tickers: list[str]):
        self.tickers = tickers


class FinancialApiReader(DataSourceReader):
    def __init__(self, options):
        raw = options.get("tickers", "")
        self.tickers = [t.strip().upper() for t in raw.split(",") if t.strip()]
        self.mode = options.get("mode", "info")
        self.num_partitions = int(options.get("numPartitions", "4"))

    def partitions(self):
        """Contiguous ticker chunks — the reference's linspace batching
        (retrieval.py:134-137), but planned as engine partitions that
        run concurrently instead of a serial driver loop."""
        n = max(1, min(self.num_partitions, len(self.tickers) or 1))
        chunk = -(-len(self.tickers) // n)
        return [
            _TickerPartition(self.tickers[i : i + chunk])
            for i in range(0, len(self.tickers), chunk)
        ] or [_TickerPartition([])]

    def read(self, partition):
        fields = (INFO_SCHEMA if self.mode == "info" else STOCK_SCHEMA).fieldNames()
        for t in partition.tickers:
            try:
                info, bars = fake_fetcher(t)
                if self.mode == "info":
                    rec = {**info, "fetch_error": None}
                    yield tuple(rec.get(f) for f in fields)
                else:
                    for b in bars:
                        rec = {**b, "fetch_error": None}
                        yield tuple(rec.get(f) for f in fields)
            except Exception as exc:  # per-ticker isolation (B2)
                rec = {"ticker": t, "fetch_error": repr(exc)}
                yield tuple(rec.get(f) for f in fields)


class FinancialApiDataSource(DataSource):
    """``format("financial_api")`` — register with
    ``spark.dataSource.register(FinancialApiDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "financial_api"

    def schema(self):
        return INFO_SCHEMA if self.options.get("mode", "info") == "info" else STOCK_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return FinancialApiReader(self.options)
