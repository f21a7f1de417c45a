"""Oracle parity at sf0.1 for the arithmetic-sensitive entries.

The standard parity suite runs at sf0.001 (and the driver at sf0.01);
this module re-checks the entries whose cross-engine determinism rests
on quantization/overflow arguments at 10–100× the row count — where a
wrong overflow bound, a float-accumulation leak, or a boundary rounding
case would actually surface. Marked slow-ish (~1 min total); the
selection is the fixed-point aggregate family, the window-moment
family, and the deterministic recipe ops.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import QUERIES
from tests.conftest import ORACLE_TABLES, assert_frames_match

SF01_DIR = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF01_DIR), reason=f"{SF01_DIR} not generated"
)

# Entries where scale actually stresses the parity argument:
# fixed-point sums over 6e5 rows, exact window moments, md5 recipes,
# global-order enumeration, basis-point moments.
SENSITIVE = [
    "q07_flagship_industry_avg",
    "q08_monthly_avg_series",
    "q16_star_join_revenue",
    "q17_pricing_summary",
    "q55_ohlc_candles",
    "q56_vwap",
    "q52_max_drawdown",
    "q53_ewma_smoothing",
    "q54_symbol_correlation",
    "q57_returns_volatility",
    "q60_bollinger_bands",
    "q61_tick_rule_imbalance",
    "q59_ntile_quartiles",
    "x01_dedup_exact",
    "x31_hash_split",
    "x42_deterministic_shuffle",
    "x55_hash_stratified_sample",
    # round 5: the crawl family's pinned scalar chains (string-heavy
    # derivations where a dialect divergence would compound with
    # corpus size), the ORC round-trip, the multiplicity-keeping BPE
    # counts, and the streaming session-window eviction boundary.
    "x65_url_canonicalize",
    "x66_host_aggregation",
    "x67_crawl_budget",
    "x68_orc_roundtrip",
    "x70_robots_filter",
    "x71_bpe_pair_counts",
    "s15_streaming_session_window",
    # round 5 additions, second batch: rolling exact-moment windows
    # (RSI gains/losses, pair-spread Σ/Σ²) and the regression-moment
    # sums behind beta/alpha — each rests on an int64-headroom bound
    # that only row count can stress.
    "q65_rsi",
    "q66_market_beta",
    "q67_pairs_spread_zscore",
    # exact int64 token cumsums and the banded-LSH recall join at
    # 4-10x the doc/vector counts
    "x73_token_budget_mix",
    "x72_ann_recall_eval",
    # round 5, third batch: FIFO interval matching (97k pairs at sf0.1
    # — the cumsum/cell arithmetic at two orders more intervals),
    # weighted systematic thresholds (integer-division crossings over
    # much larger token totals), and the HTML extraction scalar chain
    "q69_fifo_lot_matching",
    "x75_weighted_systematic_sample",
    "x76_html_field_extract",
    "q70_sma_crossover",
    "x77_int8_recall",
    "q71_candlestick_patterns",
    # round 6: the Sharpe/Sortino moment sums (same int64-headroom
    # class as q57/q66) and the aHash banded near-dup (bit-exact hash
    # arithmetic at 10x the assets)
    "q72_sharpe_sortino",
    "x78_phash_near_dup",
    # round 6, second session: the VaR tail-sum rides the same int64
    # bp-return headroom as q72, and the rank/k arithmetic only
    # stresses at larger per-symbol return counts
    "q75_var_cvar",
    # the skew profiler's ppm products (1e6 * cnt * n_keys) only
    # exercise the shared-double-chain determinism at real key counts
    "x84_join_key_skew_profile",
]


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in ORACLE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF01_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", SENSITIVE)
def test_oracle_parity_at_sf01(spark, duck01, name):
    spec = QUERIES[name]
    assert spec.oracle is not None, f"{name} must be oracle-backed"
    sdf = spec.spark(spark, SF01_DIR)
    rel = duck01.sql(spec.oracle)
    assert_frames_match(sdf, rel, f"{name}@sf0.1")
