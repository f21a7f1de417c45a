"""Handwritten-fixture semantics pin for incremental_dedup_flags —
written with the round-12 distinct-text collapse (flags are per-TEXT
properties; all tiers run at the fingerprint level and map back), so
every verdict class is exercised on rows whose expected flags are
derivable by eye, including the collapse's own edge: two new docs with
identical bytes MUST carry identical flags."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.dedup import (
    incremental_dedup_flags,
)

# ~20-token texts: the 3-shingle Jaccard between NEAR and its corpus
# partner is high (one token changed); NOVEL shares nothing.
_BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
)
_NEAR = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra CHANGED"
)
_NOVEL = (
    "one two three four five six seven eight nine ten eleven twelve "
    "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
)


def _flags(spark, new_rows, corpus_rows, **kw):
    new_df = spark.createDataFrame(new_rows, "doc_id long, text string")
    corp_df = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    out = incremental_dedup_flags(
        new_df, corp_df, id_col="doc_id", text_col="text",
        n=3, threshold=0.2, **kw
    )
    return {r["doc_id"]: (r["dup_exact"], r["dup_near"]) for r in out.collect()}


def test_flag_classes_by_hand(spark):
    got = _flags(
        spark,
        [(1, _BASE), (2, _NEAR), (3, _NOVEL)],
        [(100, _BASE), (101, _NOVEL.replace("twenty", "hundred"))],
    )
    assert got[1] == (True, False), "byte-identical text -> exact, not near"
    assert got[2] == (False, True), "one-token edit -> near dup"
    # doc 3 shares 17 of 20 tokens' shingles with corpus doc 101
    # (suffix changed) -> near; sanity-check it is NOT exact
    assert got[3][0] is False


def test_identical_new_texts_get_identical_flags(spark):
    """The collapse edge: duplicate texts WITHIN the new batch are one
    fingerprint internally but must each report their flags."""
    got = _flags(
        spark,
        [(1, _BASE), (2, _BASE), (3, _NEAR), (4, _NEAR)],
        [(100, _BASE)],
    )
    assert got[1] == got[2] == (True, False)
    assert got[3] == got[4] == (False, True)
    assert len(got) == 4


def test_no_corpus_partner_is_kept(spark):
    got = _flags(spark, [(1, _NOVEL)], [(100, _BASE)])
    assert got[1] == (False, False)
