"""Pins for the x104/x105 end-to-end corpus pipeline (VERDICT r7 item 3).

The composition contract, beyond the driver's value-hash check:
1. building the whole 8-stage DAG launches ZERO Spark jobs — no
   driver materialization between stages;
2. every interior training chunk packs to exactly 512 tokens (x81's
   invariant, now proven on the COMPOSED survivors, not the raw
   corpus);
3. the audit lineage is non-vacuous: canonicalize is an annotation
   (equal counts), every later stage genuinely drops rows at this SF
   (the vacuous-green guard, applied per stage);
4. the pack row of the audit is consistent with the membership table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import QUERIES
from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_pipeline import (
    _PACK_C,
    pipeline_stages,
)


def test_build_runs_no_jobs(spark, sf_dir):
    """Constructing both pipeline DataFrames (all 8 stages + the audit
    union) must not launch a single Spark job — the DAG stays lazy end
    to end. Jobs are tracked via a dedicated job group."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table

    # schema inference on the FIRST parquet read of a session is a
    # one-off footer job owned by the reader, not the pipeline; warm it
    # outside the probe group so the probe sees only pipeline work
    read_table(spark, sf_dir, "documents").schema
    sc = spark.sparkContext
    sc.setJobGroup("x104_build_probe", "pipeline build must stay lazy")
    try:
        QUERIES["x104_corpus_pipeline_e2e"].spark(spark, sf_dir)
        QUERIES["x105_corpus_pipeline_audit"].spark(spark, sf_dir)
        jobs = sc.statusTracker().getJobIdsForGroup("x104_build_probe")
    finally:
        sc.setJobGroup(None, None)
    assert list(jobs) == [], f"pipeline build launched jobs: {list(jobs)}"


def test_interior_chunks_pack_exactly(spark, sf_dir):
    pk = QUERIES["x104_corpus_pipeline_e2e"].spark(spark, sf_dir)
    per_chunk = (
        pk.groupBy("chunk_id")
        .agg(F.sum("n_toks_in_chunk").alias("toks"))
        .orderBy("chunk_id")
        .collect()
    )
    assert len(per_chunk) >= 2  # non-vacuous: at least one interior chunk
    for row in per_chunk[:-1]:  # all but the tail chunk
        assert row["toks"] == _PACK_C, (row["chunk_id"], row["toks"])
    assert 0 < per_chunk[-1]["toks"] <= _PACK_C


def test_audit_lineage_nonvacuous(spark, sf_dir):
    rows = {
        r["stage"]: r
        for r in QUERIES["x105_corpus_pipeline_audit"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert set(rows) == {
        "ingest", "canonicalize", "host_budget", "exact_dedup",
        "decontaminate", "quality_gate", "mix", "pack",
    }
    # ingest really ingested the re-crawl overlap on top of the corpus
    assert rows["ingest"]["n_docs"] > 500
    # canonicalize annotates, never drops
    assert rows["canonicalize"]["n_docs"] == rows["ingest"]["n_docs"]
    # every later stage drops at least one document at this SF —
    # a stage that drops nothing is a vacuous link in the chain
    order = [
        "canonicalize", "host_budget", "exact_dedup",
        "decontaminate", "quality_gate", "mix",
    ]
    for prev, cur in zip(order, order[1:]):
        assert rows[cur]["n_docs"] < rows[prev]["n_docs"], (prev, cur)
    # pack keeps every mixed doc and adds exactly one EOS token each
    assert rows["pack"]["n_docs"] == rows["mix"]["n_docs"]
    assert (
        rows["pack"]["n_tokens"]
        == rows["mix"]["n_tokens"] + rows["mix"]["n_docs"]
    )


def test_audit_matches_membership(spark, sf_dir):
    frames = pipeline_stages(spark, sf_dir)
    pk = frames["pack"].agg(
        F.countDistinct("doc_id").alias("docs"),
        F.sum("n_toks_in_chunk").alias("toks"),
    ).collect()[0]
    audit = {
        r["stage"]: r
        for r in QUERIES["x105_corpus_pipeline_audit"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert pk["docs"] == audit["pack"]["n_docs"]
    assert pk["toks"] == audit["pack"]["n_tokens"]
