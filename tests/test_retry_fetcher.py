"""RetryingFetcher policy tests (S4 production adapter): retries are
bounded, backoff is exponential-with-deterministic-jitter, and only
declared-transient failures retry. All through the same Fetcher
protocol the distributed extract uses — no network needed.
"""

from __future__ import annotations

import pytest

from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.api_fetch import (
    RetryingFetcher,
    fake_fetcher,
    fetch_info,
)


class Flaky:
    """Fails `n_failures` times with `exc`, then delegates to fake_fetcher."""

    def __init__(self, n_failures: int, exc: Exception):
        self.n_failures = n_failures
        self.exc = exc
        self.calls = 0

    def __call__(self, ticker: str):
        self.calls += 1
        if self.calls <= self.n_failures:
            raise self.exc
        return fake_fetcher(ticker)


def test_retries_transient_then_succeeds():
    sleeps: list[float] = []
    inner = Flaky(2, ConnectionError("rate limited"))
    f = RetryingFetcher(inner, max_attempts=3, base_delay_s=0.5, sleep=sleeps.append)
    info, bars = f("AAPL")
    assert info["ticker"] == "AAPL" and len(bars) == 12
    assert inner.calls == 3
    # exponential base schedule with jitter in [1, 1.5)
    assert len(sleeps) == 2
    assert 0.5 <= sleeps[0] < 0.75
    assert 1.0 <= sleeps[1] < 1.5


def test_gives_up_after_max_attempts():
    sleeps: list[float] = []
    inner = Flaky(99, TimeoutError("still down"))
    f = RetryingFetcher(inner, max_attempts=3, base_delay_s=0.1, sleep=sleeps.append)
    with pytest.raises(TimeoutError):
        f("MSFT")
    assert inner.calls == 3
    assert len(sleeps) == 2  # no sleep after the final attempt


def test_non_retryable_propagates_immediately():
    inner = Flaky(99, ValueError("bad ticker"))
    f = RetryingFetcher(inner, max_attempts=5, sleep=lambda s: None)
    with pytest.raises(ValueError):
        f("GOOG")
    assert inner.calls == 1


def test_jitter_deterministic_and_ticker_spread():
    f = RetryingFetcher(fake_fetcher, sleep=lambda s: None)
    assert f._jitter("AAPL", 0) == f._jitter("AAPL", 0)
    # different tickers should not all share one backoff schedule
    vals = {f._jitter(t, 0) for t in ("AAPL", "MSFT", "GOOG", "AMZN", "META")}
    assert len(vals) > 1
    assert all(1.0 <= v < 1.5 for v in vals)


def test_retrying_fetcher_isolates_inside_distributed_extract(spark):
    """End-to-end through mapInPandas: a fetcher whose transient failure
    exhausts retries surfaces as that ticker's fetch_error row; healthy
    tickers are unaffected."""

    class FailsOne:
        def __call__(self, ticker: str):
            if ticker == "BAD":
                raise ConnectionError("down")
            return fake_fetcher(ticker)

    f = RetryingFetcher(FailsOne(), max_attempts=2, sleep=lambda s: None)
    tickers = spark.createDataFrame(
        [("aapl",), ("bad",), ("msft",)], "ticker_name string"
    )
    rows = {r["ticker"]: r for r in fetch_info(tickers, fetcher=f).collect()}
    assert rows["BAD"]["fetch_error"] is not None
    assert rows["AAPL"]["fetch_error"] is None
    assert rows["MSFT"]["shortname"] == "Msft Inc"


def test_yfinance_fetcher_gated_import():
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.api_fetch import (
        yfinance_fetcher,
    )

    with pytest.raises(ImportError, match="yfinance"):
        yfinance_fetcher("AAPL")
