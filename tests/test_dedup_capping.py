"""Hot-shingle capping in ngram_jaccard_pairs: the cap must prune
candidate generation without changing the similarity of surviving
pairs (verification recomputes exact Jaccard from full shingle sets).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.dedup import (
    ngram_jaccard_pairs,
    word_shingles,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table


def _pairs(df, **kw):
    return {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.2, **kw).collect()
    }


def test_generous_cap_is_exact(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    uncapped = _pairs(docs)
    # cap above the corpus's max shingle document-frequency → identical
    max_df = (
        docs.select(F.explode(word_shingles(F.col("text"), 3)).alias("s"))
        .groupBy("s")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    capped = _pairs(docs, hot_shingle_cap=int(max_df))
    assert capped == uncapped
    assert uncapped, "empty pair set — threshold no longer exercises dedup"


def test_tiny_cap_prunes_but_never_alters_similarity(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    uncapped = _pairs(docs)
    capped = _pairs(docs, hot_shingle_cap=2)
    # capping can only LOSE pairs (ones supported solely by hot
    # shingles), never invent them or change a survivor's similarity
    assert set(capped) <= set(uncapped)
    for pair, jac in capped.items():
        assert jac == uncapped[pair]
