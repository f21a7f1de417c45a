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


@pytest.mark.parametrize(
    "name",
    ["x72_ann_recall_eval", "x74_matryoshka_recall", "x77_int8_recall"],
)
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


# ---------------------------------------------------------------------------
# q69 — FIFO lot matching invariants
# ---------------------------------------------------------------------------


def test_fifo_conserves_matched_quantity(spark, sf_dir):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table

    pairs = _run(spark, sf_dir, "q69_fifo_lot_matching").cache()
    try:
        # every pair is unique and carries positive quantity
        n = pairs.count()
        assert n > 0
        assert pairs.select("buy_id", "sell_id").distinct().count() == n
        assert pairs.filter(F.col("matched_qty") < 1).count() == 0

        # conservation: per symbol, total matched = min(Σ buys, Σ sells)
        # — the FIFO queue drains exactly the smaller side
        e = (
            read_table(spark, sf_dir, "events")
            .select(
                "event_type",
                F.get_json_object("props", "$.k").cast("bigint").alias("qty"),
                F.expr(
                    "CASE WHEN event_id % 2 = 0 THEN 'B' ELSE 'S' END"
                ).alias("side"),
            )
            .filter(F.col("qty") > 0)
            .groupBy("event_type")
            .agg(
                F.sum(F.when(F.col("side") == "B", F.col("qty"))).alias("bq"),
                F.sum(F.when(F.col("side") == "S", F.col("qty"))).alias("sq"),
            )
            .select("event_type", F.least("bq", "sq").alias("expected"))
        )
        got = pairs.groupBy("event_type").agg(
            F.sum("matched_qty").alias("matched")
        )
        diff = got.join(e, "event_type").filter(
            F.col("matched") != F.col("expected")
        )
        assert diff.count() == 0

        # no buy lot over-consumed: Σ matched per buy ≤ the lot's qty
        lots = (
            read_table(spark, sf_dir, "events")
            .filter(F.expr("event_id % 2 = 0"))
            .select(
                F.col("event_id").alias("buy_id"),
                F.get_json_object("props", "$.k").cast("bigint").alias("qty"),
            )
        )
        over = (
            pairs.groupBy("buy_id")
            .agg(F.sum("matched_qty").alias("m"))
            .join(lots, "buy_id")
            .filter(F.col("m") > F.col("qty"))
        )
        assert over.count() == 0
    finally:
        pairs.unpersist()


# ---------------------------------------------------------------------------
# x75 — weighted systematic sampling invariants
# ---------------------------------------------------------------------------


def test_weighted_sample_at_most_k_per_source_and_deterministic(spark, sf_dir):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table

    out = _run(spark, sf_dir, "x75_weighted_systematic_sample")
    per = out.groupBy("source").agg(F.count("*").alias("n")).collect()
    assert per, "sample is empty"
    # Madow sampling draws at MOST k per source (exactly k unless one
    # doc straddles multiple thresholds), and never zero: the last
    # doc's cumsum always crosses threshold k
    assert all(1 <= r["n"] <= 8 for r in per)
    # every source with documents is represented
    n_sources = (
        read_table(spark, sf_dir, "documents").select("source").distinct().count()
    )
    assert len(per) == n_sources
    # deterministic: a fresh plan returns the identical pick set
    again = _run(spark, sf_dir, "x75_weighted_systematic_sample")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_weighted_sample_guarantees_heavy_doc(spark):
    """A doc heavier than total/k must ALWAYS be drawn (PPS property)."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans import catalog_llm as L

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.text import token_count

    docs = spark.createDataFrame(
        [(i, "s", "w " * (2000 if i == 17 else 3)) for i in range(40)],
        "doc_id long, source string, text string",
    )
    # run the production expressions directly over the fixture
    d = docs.select(
        "doc_id",
        "source",
        (token_count(F.col("text")).cast("bigint") + 1).alias("w_toks"),
    )
    c = d.selectExpr(
        "source",
        "doc_id",
        "w_toks",
        f"CAST({L._X75_CUM} AS BIGINT) AS cum_toks",
        f"CAST({L._X75_TOT} AS BIGINT) AS total_toks",
    )
    picked = c.filter(F.expr(L._x75_pick("DIV")))
    assert picked.filter(F.col("doc_id") == 17).count() == 1


# ---------------------------------------------------------------------------
# x76 — HTML extraction invariants
# ---------------------------------------------------------------------------


def test_html_extract_fields_track_synthesis_axes(spark, sf_dir):
    df = _run(spark, sf_dir, "x76_html_field_extract").cache()
    try:
        # the %7 axis: title is NULL exactly where the element is absent
        assert df.filter(
            (F.col("doc_id") % 7 == 0) & F.col("title").isNotNull()
        ).count() == 0
        assert df.filter(
            (F.col("doc_id") % 7 != 0) & F.col("title").isNull()
        ).count() == 0
        # the %4 axis: anchor count equals the synthesized repeat count
        assert df.filter(F.col("n_links") != F.col("doc_id") % 4).count() == 0
        # stripped body is non-empty and markup_pct is a valid percent
        assert df.filter(F.col("body_len") <= 0).count() == 0
        assert df.filter(
            (F.col("markup_pct") < 0) | (F.col("markup_pct") > 100)
        ).count() == 0
    finally:
        df.unpersist()


# ---------------------------------------------------------------------------
# q70 — SMA crossover invariants
# ---------------------------------------------------------------------------


def test_sma_crossover_signals_self_consistent(spark, sf_dir):
    df = _run(spark, sf_dir, "q70_sma_crossover").cache()
    try:
        assert df.count() > 0
        # one signal per (symbol, day)
        assert (
            df.select("event_type", "day").distinct().count() == df.count()
        )
        # on warm rows f_n = 5 and s_n = 20 by construction, so the
        # emitted label must agree with the cross-multiplied state
        bad = df.filter(
            (
                (F.col("signal") == "golden")
                & (F.col("f_sum") * 20 <= F.col("s_sum") * 5)
            )
            | (
                (F.col("signal") == "death")
                & (F.col("f_sum") * 20 >= F.col("s_sum") * 5)
            )
        )
        assert bad.count() == 0
        assert df.filter(~F.col("signal").isin("golden", "death")).count() == 0
    finally:
        df.unpersist()


def test_sma_crossover_tie_reentry_is_not_a_cross(spark):
    """1→0→1 must emit nothing (same-side re-entry through an exact
    tie); 1→0→-1 must emit the death exactly once, carried through
    the tie day."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans import catalog_fin as CF

    df = spark.createDataFrame(
        [
            ("A", "d01", 1),
            ("A", "d02", 0),
            ("A", "d03", 1),   # re-entry after tie: NOT a cross
            ("A", "d04", -1),  # death (last non-zero was 1)
            ("A", "d05", 0),
            ("A", "d06", 1),   # golden, carried through the d05 tie
            ("B", "d01", -1),  # first state ever: no prior side, no signal
        ],
        "event_type string, day string, state_w int",
    )
    lg = df.selectExpr(
        "event_type", "day", "state_w",
        CF._q70_prev_nz("spark") + " AS prev_nz",
    )
    got = sorted(
        (r["event_type"], r["day"], r["state_w"])
        for r in lg.filter(
            "(state_w = 1 AND prev_nz = -1) OR (state_w = -1 AND prev_nz = 1)"
        ).collect()
    )
    assert got == [("A", "d04", -1), ("A", "d06", 1)]


def test_candlestick_flags_recomputable_from_emitted_bars(spark, sf_dir):
    """The output carries the bars themselves, so every flag must be
    recomputable from the row (+ the previous day's bar for the
    engulfing) — pins the predicates against the emitted data."""
    rows = _run(spark, sf_dir, "q71_candlestick_patterns").collect()
    assert rows
    prev = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["day"])):
        body, rng = abs(r["c"] - r["o"]), r["h"] - r["l"]
        assert r["is_doji"] == int(body * 10 <= rng)
        assert r["is_hammer"] == int(
            (min(r["o"], r["c"]) - r["l"]) >= 2 * body
            and (r["h"] - max(r["o"], r["c"])) <= body
            and r["h"] > r["l"]
        )
        p = prev.get(r["event_type"])
        assert r["is_bullish_engulf"] == int(
            p is not None
            and p["o"] > p["c"]
            and r["c"] > r["o"]
            and r["o"] <= p["c"]
            and r["c"] >= p["o"]
        )
        prev[r["event_type"]] = r
