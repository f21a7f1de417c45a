"""Unit fixtures for the late round-2 operators: snapshot-diff CDC,
blocked edit-distance entity matching, deterministic corpus mixing."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.dedup import (
    blocked_levenshtein_pairs,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.sampling import (
    mix_corpora_deterministic,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.scd import snapshot_diff


def test_snapshot_diff_actions(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, seg string, bal double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (3, "c", None), (5, "e", 50.0)],
        "k long, seg string, bal double",
    )
    out = {r["k"]: r["action"] for r in snapshot_diff(old, new, "k", ["seg", "bal"]).collect()}
    # 1 unchanged (dropped), 2 updated, 3 unchanged incl. NULL attr
    # (null-safe compare), 4 deleted, 5 inserted
    assert out == {2: "update", 4: "delete", 5: "insert"}


def test_snapshot_diff_null_transition_is_update(spark):
    old = spark.createDataFrame([(1, None)], "k long, seg string")
    new = spark.createDataFrame([(1, "x")], "k long, seg string")
    rows = snapshot_diff(old, new, "k", ["seg"]).collect()
    assert len(rows) == 1 and rows[0]["action"] == "update"


def test_blocked_levenshtein_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, "acme corp"),
            (2, "acme corp."),   # dist 1, same block
            (3, "acme industries"),  # same block, dist > 2
            (4, "zenith corp"),  # different block — never compared
        ],
        "id long, name string",
    )
    out = blocked_levenshtein_pairs(
        df,
        id_col="id",
        text_col="name",
        block_col=F.split(F.col("name"), " ").getItem(0),
        max_dist=2,
    ).collect()
    assert [(r["id_a"], r["id_b"], r["edit_dist"]) for r in out] == [(1, 2, 1)]


def test_snapshot_diff_null_key_is_a_value(spark):
    """A NULL-keyed row must diff as a normal key (null-safe key join),
    not explode into a phantom insert + delete."""
    old = spark.createDataFrame([(None, "a"), (1, "x")], "k string, seg string")
    same = spark.createDataFrame([(None, "a"), (1, "x")], "k string, seg string")
    changed = spark.createDataFrame([(None, "b"), (1, "x")], "k string, seg string")
    assert snapshot_diff(old, same, "k", ["seg"]).count() == 0
    rows = snapshot_diff(old, changed, "k", ["seg"]).collect()
    assert len(rows) == 1
    assert rows[0]["k"] is None and rows[0]["action"] == "update"
    assert rows[0]["old_seg"] == "a" and rows[0]["new_seg"] == "b"


def test_blocked_levenshtein_hot_block_cap(spark):
    """An adversarial hot block ('the ...' × many rows) is dropped from
    candidate generation under the cap; cold-block pairs survive with
    identical distances."""
    hot = [(i, f"the company {i}") for i in range(30)]  # 435 in-block pairs
    cold = [(100, "acme corp"), (101, "acme corp."), (102, "acme industries")]
    df = spark.createDataFrame(hot + cold, "id long, name string")
    kw = dict(
        id_col="id",
        text_col="name",
        block_col=F.split(F.col("name"), " ").getItem(0),
        max_dist=2,
    )
    uncapped = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in blocked_levenshtein_pairs(df, **kw).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in blocked_levenshtein_pairs(df, hot_block_cap=10, **kw).collect()
    }
    # hot-block pairs (both ids < 100) exist uncapped, vanish capped
    assert any(a < 100 for a, _ in uncapped)
    assert all(a >= 100 for a, _ in capped)
    # the surviving cold pair is identical in membership AND distance
    assert capped == {(100, 101): 1}
    assert uncapped[(100, 101)] == 1


def test_mix_deterministic_layout_and_seed(spark):
    rows = [(i, f"src{i % 2}", 10) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    kw = dict(
        source_col="source", token_col="n_tokens", key_col="doc_id",
        target_weights={"src0": 0.8, "src1": 0.2},
    )
    a = {r["doc_id"] for r in mix_corpora_deterministic(df, seed=1, **kw).collect()}
    b = {
        r["doc_id"]
        for r in mix_corpora_deterministic(df.repartition(7), seed=1, **kw).collect()
    }
    c = {r["doc_id"] for r in mix_corpora_deterministic(df, seed=2, **kw).collect()}
    assert a == b          # layout-independent
    assert a != c          # seed-sensitive
    # src0 wants 80% of grand mass but holds only 50% → kept whole;
    # src1 downsamples toward 20/80 ∝ its 0.2/0.5 fraction
    kept = mix_corpora_deterministic(df, seed=1, **kw).groupBy("source").count()
    counts = {r["source"]: r["count"] for r in kept.collect()}
    assert counts["src0"] == 200
    assert 40 <= counts["src1"] <= 120  # hash-uniform ≈ 0.4·200
