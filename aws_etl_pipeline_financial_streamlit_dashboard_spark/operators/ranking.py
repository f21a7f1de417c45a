"""Lexical retrieval scoring — BM25 top-k over a document corpus.

A training-data pipeline retrieves as much as it filters: "find the
documents most relevant to these probe terms" drives eval-set curation,
targeted decontamination sweeps, and quality audits ("what does the
corpus say about X"). BM25 (Robertson et al., the Okapi weighting) is
the standard lexical ranker and composes entirely from the corpus
statistics the engine already computes for TF-IDF (x23): term
frequency, document frequency, document length.

Engine-portable scoring: the per-(doc, term) BM25 contribution is one
shared SQL expression (identical text parsed by Spark and the DuckDB
oracle), HALF_UP-quantized to integer MICROS before the per-document
sum — integer sums are order-independent, so cross-engine parity does
not depend on float summation order (the dec_sum discipline). The only
residual cross-engine risk is the last ulp of ``LN`` at a rounding
boundary, the same accepted class as x23's idf (documented there).

Scale shape: token explode → two grouped aggregates (term frequency
keyed (doc, term) after an IN-filter to the probe terms, document
frequency keyed (term)), a 1-row corpus-stats aggregate broadcast into
the scored frame (no driver ``count()``), and a TakeOrderedAndProject
top-k — no global sort, no window over the corpus. Only (doc, term)
aggregate rows shuffle, never the token stream; candidate rows are
bounded by |docs containing a probe term|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.text import token_count, tokens

# Okapi constants, folded where possible (k1+1 = 2.2, 1-b = 0.25).
# Every numeric literal is CAST AS DOUBLE inside the shared expression:
# Spark parses bare `1.2` as DECIMAL(2,1) (DuckDB: DOUBLE), and a
# decimal-typed subexpression would evaluate differently per engine.
_D = "CAST({} AS DOUBLE)"


def bm25_term_score_sql(tf: str, df: str, dl: str, n_docs: str, avgdl: str) -> str:
    """The per-(doc, term) BM25 contribution as ONE engine-portable SQL
    string (k1=1.2, b=0.75), quantized to integer micros:

        idf  = LN(1 + (N - df + 0.5) / (df + 0.5))
        tfc  = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
        mic  = FLOOR(idf · tfc · 1e6 + 0.5)

    Both engines parse the identical text, so the float-op sequence —
    and therefore the quantized integer — matches bitwise (modulo the
    documented LN-ulp-at-boundary class)."""
    half = _D.format("0.5")
    idf = (
        f"LN({_D.format('1')} + (CAST({n_docs} AS DOUBLE) - {df} + {half})"
        f" / ({df} + {half}))"
    )
    tfc = (
        f"({tf} * {_D.format('2.2')}) / ({tf} + {_D.format('1.2')}"
        f" * ({_D.format('0.25')} + {_D.format('0.75')} * {dl} / {avgdl}))"
    )
    return (
        f"CAST(FLOOR({idf} * {tfc} * {_D.format('1000000')} + {half}) AS BIGINT)"
    )


def bm25_topk(
    df: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 score for the probe ``terms``.
    Returns (id, score) with score = Σ term micros / 1e6, ordered by
    (score DESC, id) — the id tiebreak makes the cut deterministic.
    Documents containing none of the terms score 0 and are excluded
    (standard lexical-retrieval candidate semantics)."""
    terms = list(terms)
    base = df.select(F.col(id_col), F.col(text_col))
    lengths = base.select(
        F.col(id_col), token_count(F.col(text_col)).alias("__dl")
    )
    stats = lengths.agg(
        F.expr("COUNT(*)").alias("__n_docs"),
        F.expr("CAST(SUM(__dl) AS DOUBLE) / COUNT(*)").alias("__avgdl"),
    )
    tok = base.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t")
    ).filter(F.col("__t").isin(terms))
    tf = tok.groupBy(id_col, "__t").agg(F.count("*").alias("__tf"))
    dfreq = tok.groupBy("__t").agg(
        F.count_distinct(id_col).alias("__df")
    )
    mic = bm25_term_score_sql("__tf", "__df", "__dl", "__n_docs", "__avgdl")
    scored = (
        tf.join(F.broadcast(dfreq), "__t")
        .join(lengths, id_col)
        .join(F.broadcast(stats), how="cross")
        .groupBy(id_col)
        .agg(F.expr(f"CAST(SUM({mic}) AS DOUBLE) / 1000000.0").alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
