"""Unit tests for operators.splits: deterministic hash splits and
eval-set decontamination (the x30/x31 catalog entries exercise the
oracle parity; these pin the operator-level contracts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators import splits as SP
from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table


def test_hash_split_is_deterministic_and_exhaustive(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = SP.hash_split(docs, "text").groupBy("split").count().collect()
    b = SP.hash_split(docs, "text").groupBy("split").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    names = {r["split"] for r in a}
    assert names <= {"train", "val", "test"}
    assert sum(r["count"] for r in a) == docs.count()


def test_hash_split_duplicates_same_split(spark):
    # identical content → identical split, regardless of row id
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other text")], ["id", "text"]
    )
    out = SP.hash_split(df, "text").collect()
    by_text = {}
    for r in out:
        by_text.setdefault(r["text"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_text.values())


def test_hash_split_ratio_near_target(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    n = docs.count()
    counts = {
        r["split"]: r["count"]
        for r in SP.hash_split(docs, "text").groupBy("split").count().collect()
    }
    # md5 buckets are uniform; at n≈600 allow a generous tolerance
    assert abs(counts.get("train", 0) / n - 0.80) < 0.10


def test_hash_split_validates_percents(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        SP.hash_split(docs, "text", splits=(("a", 60), ("b", 60)))


def test_decontaminate_drop_flag_consistency(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    tr = docs.filter(F.col("doc_id") % 97 != 0)
    flagged = SP.decontaminate(tr, ev, n=5, mode="flag")
    dropped = SP.decontaminate(tr, ev, n=5, mode="drop")
    n_clean = flagged.filter(~F.col("contaminated")).count()
    assert dropped.count() == n_clean
    # eval docs themselves always self-collide when included in train
    leaky = SP.decontaminate(docs, ev, n=5, mode="flag")
    ev_rows = leaky.join(ev.select("doc_id"), "doc_id", "leftsemi")
    assert ev_rows.filter(~F.col("contaminated")).count() == 0


def test_decontaminate_rejects_bad_mode(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        SP.decontaminate(docs, docs, mode="purge")
