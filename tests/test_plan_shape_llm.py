"""Physical-plan regressions for the round-2 LLM-pipeline entries
(plans/catalog_llm.py): each pins the property that makes the operator
viable at corpus scale, read off the executed plan."""

from __future__ import annotations

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontamination_broadcasts_eval_shingles(spark, sf_dir):
    """x30: the eval shingle set must reach the training corpus as a
    BROADCAST semi-join — shuffling the training side by shingle would
    shuffle the whole corpus per benchmark refresh."""
    df = QUERIES["x30_decontamination"].spark(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the only hash exchanges allowed: eval-shingle distinct, hit-id
    # distinct, and the final per-source aggregate — never the corpus
    # keyed by shingle
    assert plan.count("Exchange hashpartitioning") <= 4


def test_hash_split_is_narrow(spark, sf_dir):
    """x31 before the audit count: split assignment itself must be a
    zero-shuffle narrow transform (pure hash arithmetic per row)."""
    from pyspark.sql import functions as F

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators import splits as SP
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    df = SP.hash_split(docs, "text").select("doc_id", "split")
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan  # no Python UDF crept in


def test_normalize_is_narrow_codegen(spark, sf_dir):
    """x34: canonical text form is scan + project only."""
    df = QUERIES["x34_text_normalize"].spark(spark, sf_dir)
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "*(1)" in plan  # whole-stage-codegen'd single stage


def test_source_overlap_shuffles_vocab_not_tokens(spark, sf_dir):
    """x36: the self-join input must be the DISTINCT (source, shingle)
    vocabulary; per-source set sizes join back as broadcasts."""
    df = QUERIES["x36_source_overlap"].spark(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "HashAggregate" in plan  # the distinct collapses duplicates


def test_grouping_sets_single_expand_single_shuffle(spark, sf_dir):
    """q35: GROUPING SETS must plan one Expand feeding one aggregation
    exchange — not one scan per set."""
    df = QUERIES["q35_grouping_sets"].spark(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("Expand") >= 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Scan parquet") == 1


def test_quantize_audit_is_narrow_codegen(spark, sf_dir):
    """x39: the quantization audit must be a zero-shuffle narrow
    projection with no interpreted fallback — a CodeGenerator failure
    (method > 64 KB) would silently drop the stage to interpreted
    execution, and a shuffle would mean the per-vector math was
    restructured through an aggregate it doesn't need."""
    df = QUERIES["x39_embedding_quantize"].spark(spark, sf_dir)
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    df.collect()  # AQE-finalize before reading codegen markers
    plan = _plan(df)
    assert "*(1)" in plan  # whole-stage codegen compiled (no janino overflow)


def test_no_row_python_udf_in_any_batch_entry(spark, sf_dir):
    """Engine-wide invariant (docs/SCALE.md 'Python boundary policy'):
    no batch catalog entry may plan a row-at-a-time Python UDF
    (BatchEvalPython). Arrow-batched Python (ArrowEvalPython /
    MapInPandas) is permitted only where semantics require it — the
    multimodal decode entries. Catches any future entry that slips a
    Python lambda into a hot path."""
    arrow_allowed = {"x12_media_features", "x13_frame_sample"}
    for name, q in sorted(QUERIES.items()):
        if name.startswith("s"):  # streaming entries run real queries
            continue
        plan = _plan(q.spark(spark, sf_dir))
        assert "BatchEvalPython" not in plan, f"{name} plans a row-wise Python UDF"
        if name not in arrow_allowed:
            assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan, (
                f"{name} plans Python execution outside the multimodal allowlist"
            )


def test_quality_classifier_one_projection_one_aggregate(spark, sf_dir):
    """x95: the learned-classifier scoring path must be scan → narrow
    fold projection → ONE aggregate exchange (|sources| rows) — no UDF,
    no explode, no corpus-scale shuffle."""
    df = QUERIES["x95_quality_classifier"].spark(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan  # no Python UDF
    assert "Generate" not in plan  # no explode — the fold is per-row


def test_semantic_decontamination_broadcasts_eval(spark, sf_dir):
    """x96: the eval side must reach the corpus as a BROADCAST (the x30
    discipline); one corpus-keyed aggregate exchange only."""
    df = QUERIES["x96_semantic_decontamination"].spark(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "BatchEvalPython" not in plan
