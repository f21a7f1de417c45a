"""Sampling ops: determinism under a fixed seed, fraction accuracy,
stratum dropping, and mixing toward target token shares."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.sampling import (
    mix_corpora,
    stratified_sample,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.text import token_count
from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table


def test_stratified_sample_deterministic_and_drops_strata(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    fr = {"src0": 0.5, "src1": 1.0}  # other sources dropped
    a = stratified_sample(docs, "source", fr, seed=7)
    b = stratified_sample(docs, "source", fr, seed=7)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )
    kept_sources = {r["source"] for r in a.select("source").distinct().collect()}
    assert kept_sources <= {"src0", "src1"}
    # full-fraction stratum keeps every row
    n_src1_all = docs.filter(F.col("source") == "src1").count()
    assert a.filter(F.col("source") == "src1").count() == n_src1_all


def test_mix_corpora_moves_shares_toward_target(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", token_count(F.col("text"))
    )
    # exaggerate an imbalance: all of src0, plus everything else
    mixed = mix_corpora(
        docs,
        "source",
        "toks",
        target_weights={"src0": 0.5, "src1": 0.5},
        seed=7,
    )
    out = {
        r["source"]: r["t"]
        for r in mixed.groupBy("source").agg(F.sum("toks").alias("t")).collect()
    }
    assert set(out) <= {"src0", "src1"}  # unweighted sources dropped
    # both kept sources contribute; shares are of the same order
    assert all(v > 0 for v in out.values())
    shares = [v / sum(out.values()) for v in out.values()]
    assert max(shares) < 0.8  # far from degenerate, headed toward 50/50


def test_mix_corpora_never_upsamples(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "toks", token_count(F.col("text"))
    )
    mixed = mix_corpora(
        docs, "source", "toks", target_weights={"src0": 0.99, "src1": 0.01}, seed=7
    )
    n_src0_all = docs.filter(F.col("source") == "src0").count()
    assert mixed.filter(F.col("source") == "src0").count() <= n_src0_all
