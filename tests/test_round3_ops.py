"""Unit fixtures for the round-3 operators: BM25 retrieval, winnowing
fingerprints, deterministic k-means — property checks beyond the
catalog oracle parity (which pins exact values at sf0.01)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.clustering import (
    kmeans_deterministic,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.dedup import (
    winnowing_fingerprints,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.ranking import bm25_topk


def test_bm25_ranks_term_density_and_respects_k(spark):
    docs = spark.createDataFrame(
        [
            (1, "vector vector vector search"),          # dense in probe term
            (2, "vector search over a long corpus of many other words here"),
            (3, "nothing relevant at all"),               # no probe terms
            (4, "vector"),                                # short + on-topic
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, terms=["vector"], k=2).collect()
    assert len(out) == 2
    ids = [r["doc_id"] for r in out]
    assert 3 not in ids  # candidate semantics: no probe term, no score
    # higher tf and shorter length both raise BM25: doc 1 or 4 wins,
    # and the long diluted doc 2 must not outrank the dense doc 1
    scores = {r["doc_id"]: r["score"] for r in bm25_topk(docs, ["vector"], 4).collect()}
    assert scores[1] > scores[2]
    assert all(s > 0 for s in scores.values())


def test_winnowing_guarantees_shared_fingerprint_on_shared_run(spark):
    """The winnowing guarantee: any shared token run of >= w+k-1 tokens
    (here 6) yields at least one COMMON fingerprint hash."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    docs = spark.createDataFrame(
        [
            (1, f"intro words {shared} tail one"),
            (2, f"{shared} completely different ending tokens here"),
            (3, "no overlap with anything else at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    fp = winnowing_fingerprints(docs, k=3, w=4)
    by_doc: dict[int, set] = {1: set(), 2: set(), 3: set()}
    for r in fp.collect():
        by_doc[r["doc_id"]].add(r["fp_hash"])
    assert by_doc[1] & by_doc[2], "shared 6-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) or len(by_doc[1] & by_doc[3]) < len(
        by_doc[1] & by_doc[2]
    )


def test_winnowing_short_and_empty_docs_survive(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "")], "doc_id long, text string"
    )
    rows = winnowing_fingerprints(docs, k=3, w=4).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    # every document yields at least one fingerprint (single short window)
    assert set(per_doc) == {1, 2}
    assert all(r["fp_pos"] >= 1 for r in rows)


def test_winnowing_density(spark, sf_dir):
    """Selected fingerprints ~ 2/(w+1) of grams (the paper's expected
    density) — generous bounds catch a broken window frame."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").limit(100)
    n_grams = docs.select(
        F.sum(F.greatest(F.size(F.split(F.trim("text"), r"\s+")) - 2, F.lit(1)))
    ).collect()[0][0]
    n_fp = winnowing_fingerprints(docs, k=3, w=4).count()
    density = n_fp / n_grams
    assert 0.2 <= density <= 0.75, density  # expected ~0.4 at w=4


def test_kmeans_layout_independent_and_total(spark, sf_dir):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a = {
        r["vec_id"]: (r["cell"], r["d2"])
        for r in kmeans_deterministic(emb, k=4, n_iters=2, dim=64).collect()
    }
    b = {
        r["vec_id"]: (r["cell"], r["d2"])
        for r in kmeans_deterministic(
            emb.repartition(7), k=4, n_iters=2, dim=64
        ).collect()
    }
    assert a == b  # layout-independent, bit-identical
    assert len(a) == emb.count()  # every vector assigned exactly once
    assert all(1 <= c <= 4 and d2 >= 0 for c, d2 in a.values())
    # seeds sit on their own centroid only at iteration 1; after the
    # update rounds at least the cluster ids stay a partition of 1..4
    assert {c for c, _ in a.values()} == {1, 2, 3, 4}


def test_span_decontamination_removes_only_covered_tokens(spark):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.splits import (
        decontaminate_spans,
    )

    eval_df = spark.createDataFrame(
        [(100, "the secret eval answer is forty-two")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            # contains the eval 5-gram "secret eval answer is forty-two"
            (1, "intro words the secret eval answer is forty-two and a tail"),
            (2, "completely clean document with no leaked content at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate_spans(train, eval_df, n=5).collect()
    }
    # doc 2 untouched (whitespace-normalized reconstruction)
    assert out[2]["n_tokens_removed"] == 0
    assert out[2]["clean_text"] == "completely clean document with no leaked content at all"
    # doc 1: contaminated 5-gram spans removed, surroundings kept
    assert out[1]["n_tokens_removed"] >= 5
    kept = out[1]["clean_text"]
    assert "intro words" in kept and "tail" in kept
    assert "forty-two" not in kept and "answer" not in kept
    # 11 tokens total; eval's two 5-grams cover positions 3..8 → 6 removed
    assert out[1]["n_tokens_removed"] == 6
    assert out[1]["n_tokens_kept"] + out[1]["n_tokens_removed"] == 11
