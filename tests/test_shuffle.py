"""Deterministic-shuffle invariants (operators/shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.shuffle import (
    deterministic_shuffle,
)


def _positions(spark, n_rows: int, seed: int, num_partitions=None):
    df = spark.range(1, n_rows + 1).withColumnRenamed("id", "k")
    out = deterministic_shuffle(df, "k", seed=seed, num_partitions=num_partitions)
    return {r["k"]: r["shuffle_pos"] for r in out.collect()}


def test_contiguous_permutation(spark):
    pos = _positions(spark, 500, seed=7)
    assert sorted(pos.values()) == list(range(1, 501))


def test_layout_independent(spark):
    """Positions are a pure function of (keys, seed) — identical no
    matter how the data is partitioned."""
    a = _positions(spark, 500, seed=7, num_partitions=3)
    b = _positions(spark, 500, seed=7, num_partitions=17)
    assert a == b


def test_seed_changes_order(spark):
    a = _positions(spark, 500, seed=7)
    b = _positions(spark, 500, seed=8)
    assert a != b


def test_extra_columns_pass_through(spark):
    df = spark.range(1, 101).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("payload")
    )
    out = deterministic_shuffle(df, "k", seed=1)
    assert set(out.columns) == {"k", "payload", "shuffle_pos"}
    row = out.filter(F.col("k") == 5).first()
    assert row["payload"] == 10
