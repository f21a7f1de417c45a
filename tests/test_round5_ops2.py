"""Quality-invariant tests for the round-5 second-batch entries —
properties the oracle diff can't express (bounds, warm-up semantics,
idempotence, structural invariants), the pattern the earlier
test_round*_ops modules establish.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import QUERIES


def _run(spark, sf_dir, name):
    return QUERIES[name].spark(spark, sf_dir)


# ---------------------------------------------------------------------------
# q65 — RSI semantics
# ---------------------------------------------------------------------------


def test_rsi_bounds_and_warmup(spark, sf_dir):
    df = _run(spark, sf_dir, "q65_rsi").cache()
    try:
        # warm-up rows (fewer than 14 observed diffs) must be NULL;
        # every non-NULL RSI lies in [0, 100]
        bad_warm = df.filter((F.col("n_d") < 14) & F.col("rsi14").isNotNull())
        assert bad_warm.count() == 0
        oob = df.filter(
            F.col("rsi14").isNotNull()
            & ((F.col("rsi14") < 0) | (F.col("rsi14") > 100))
        )
        assert oob.count() == 0
        # the series actually leaves warm-up at test scale
        assert df.filter(F.col("rsi14").isNotNull()).count() > 0
    finally:
        df.unpersist()


# ---------------------------------------------------------------------------
# q66 — beta regression sanity
# ---------------------------------------------------------------------------


def test_market_beta_one_row_per_symbol(spark, sf_dir):
    df = _run(spark, sf_dir, "q66_market_beta")
    rows = df.collect()
    symbols = [r["event_type"] for r in rows]
    assert len(symbols) == len(set(symbols))
    # an equal-weight index of the symbols themselves: betas average
    # near 1 by construction (weighted by day coverage, so exactness
    # is not implied — but the mean must land in a sane band)
    betas = [r["beta"] for r in rows if r["beta"] is not None]
    assert betas, "no symbol produced a beta"
    mean_beta = sum(betas) / len(betas)
    assert 0.2 < mean_beta < 1.8, mean_beta


# ---------------------------------------------------------------------------
# q67 — pair z-score invariants
# ---------------------------------------------------------------------------


def test_pairs_zscore_warmup_and_orientation(spark, sf_dir):
    df = _run(spark, sf_dir, "q67_pairs_spread_zscore").cache()
    try:
        # pairs are strictly ordered (sym_a < sym_b): no duplicates or
        # self-pairs
        assert df.filter(F.col("sym_a") >= F.col("sym_b")).count() == 0
        # z-scores only after a full 20-day window
        assert (
            df.filter((F.col("n_w") < 20) & F.col("zscore20").isNotNull()).count()
            == 0
        )
        assert df.filter(F.col("zscore20").isNotNull()).count() > 0
    finally:
        df.unpersist()


# ---------------------------------------------------------------------------
# q68 — recursive walk structure
# ---------------------------------------------------------------------------


def test_recursive_hierarchy_depth_is_digit_count(spark, sf_dir):
    rows = _run(spark, sf_dir, "q68_recursive_hierarchy").collect()
    by_key = {r["custkey"]: r for r in rows}
    for r in rows:
        # depth = digits(custkey) - 1 on the decimal trie
        assert r["depth"] == len(str(r["custkey"])) - 1, r
        # the path's head is the root, its tail the node itself
        parts = r["path"].split("/")
        assert parts[0] == str(r["root"]) and parts[-1] == str(r["custkey"])
        # every prefix node on the path exists in the result
        for p in parts:
            assert int(p) in by_key


# ---------------------------------------------------------------------------
# x72 / x74 — recall evaluations
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["x72_ann_recall_eval", "x74_matryoshka_recall"])
def test_recall_entries_cover_all_queries_with_bounded_recall(
    spark, sf_dir, name
):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import (
        read_table,
    )

    rows = _run(spark, sf_dir, name).collect()
    n_queries = (
        read_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 29 == 1)
        .count()
    )
    # every sampled query gets a row, even at zero candidates
    assert len(rows) == n_queries
    for r in rows:
        assert 0 <= r["n_hits"] <= 10
        assert r["recall_pct"] == r["n_hits"] * 10


def test_matryoshka_prefix_search_is_informative(spark, sf_dir):
    # truncated-dim search must beat random: mean recall over queries
    # comfortably above the ~2% a random top-10 of ~500 would score
    rows = _run(spark, sf_dir, "x74_matryoshka_recall").collect()
    mean_recall = sum(r["recall_pct"] for r in rows) / len(rows)
    assert mean_recall > 10, mean_recall


# ---------------------------------------------------------------------------
# s16 — streaming upsert target invariants
# ---------------------------------------------------------------------------


def test_streaming_upsert_is_keyed_and_idempotent(spark, sf_dir):
    a = _run(spark, sf_dir, "s16_streaming_upsert").collect()
    keys = [r["user_id"] for r in a]
    assert len(keys) == len(set(keys)), "target must hold one row per key"
    # a second independent run (fresh snapshot chain + checkpoint)
    # converges to the identical serving table
    b = _run(spark, sf_dir, "s16_streaming_upsert").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
