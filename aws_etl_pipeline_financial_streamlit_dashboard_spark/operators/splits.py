"""Dataset-split assignment and eval-set decontamination — the two
bookkeeping ops every LLM training-data pipeline runs between "corpus
built" and "training starts".

Both are deterministic (content-hash based, no RNG): re-running the
pipeline on the same corpus yields byte-identical splits, and a
document's split never depends on what else is in the corpus — the
property that makes incremental corpus refreshes safe (new data can't
flip old documents across the train/test boundary).

All hot-path expressions are built-in column functions (JVM-side,
codegen'd); the only shuffle in decontamination is the shingle join,
whose key cardinality is the vocabulary of the (small) eval set.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.dedup import (
    fan_out,
    word_ngrams_all,
    word_shingles,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.text import tokens


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from the md5 of ``key``.

    Uses the first 8 hex chars (32 bits) of md5 — uniform, stable
    across engines (DuckDB twin: ``('0x' || substr(md5(k),1,8))::UBIGINT
    % n``), and content-based: identical keys land in identical buckets
    on any cluster size, any partitioning, any engine.
    """
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % n_buckets
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: Sequence[tuple[str, int]] = (("train", 80), ("val", 10), ("test", 10)),
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a named split by hash-bucketing ``key_col``.

    ``splits`` is (name, percent) with percents summing to ≤ 100; rows
    hashing past the last boundary get the final split name (so the
    default 80/10/10 covers the full range). Keying on *content* (e.g.
    the text itself) rather than a row id guarantees exact duplicates
    land in the same split — the standard guard against train/test
    leakage through dup pairs.

    Narrow transform: no shuffle, no state, no RNG — scales with input
    splits and is reproducible by construction.
    """
    total = sum(p for _, p in splits)
    if not 0 < total <= 100:
        raise ValueError(f"split percents must sum to (0, 100], got {total}")
    bucket = hash_bucket(F.col(key_col), 100)
    upper = 0
    bounds = []
    for name, pct in splits:
        upper += pct
        bounds.append((name, upper))
    expr = F.lit(bounds[-1][0])  # past the last boundary → final split
    for name, ub in reversed(bounds[:-1]):
        expr = F.when(bucket < ub, F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    mode: str = "drop",
    widen: bool = True,
) -> DataFrame:
    """Remove (or flag) training documents that share any word ``n``-gram
    with an evaluation set — benchmark decontamination, the step that
    keeps test answers out of the training corpus.

    ``mode='drop'`` returns the clean training set (anti-join);
    ``mode='flag'`` returns all training rows with a boolean
    ``contaminated`` column (left-semi membership via a distinct-join).

    Scale shape: the eval side is benchmark-sized (thousands of
    documents) — its exploded shingle set is small enough to broadcast,
    so the contamination check is a broadcast semi/anti join against
    every training split: NO shuffle of the training corpus. Long
    n-grams (n≥5 words) make boilerplate collisions rare, so the
    broadcast set stays near |eval| · tokens-per-doc. If the eval side
    ever outgrows broadcast range, the same plan degrades gracefully to
    a shuffled semi-join keyed on the shingle.
    """
    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    eval_shingles = (
        eval_df.select(F.explode(word_shingles(F.col(text_col), n)).alias("__s"))
        .distinct()
    )
    # ``widen=False`` skips the fan_out parallelism guard: for a DERIVED
    # train frame (mid-pipeline, post-shuffle — x104's composition) the
    # guard's df.rdd partition probe FINALIZES the plan, which under AQE
    # executes the upstream stages (real Spark jobs) just to read a
    # partition count — breaking the pipeline's lazy-DAG contract. A
    # post-shuffle frame is already ≥ shuffle.partitions wide, so the
    # guard buys nothing there; file-backed callers keep the default.
    narrow = train.select(id_col, text_col)
    exploded = (fan_out(narrow) if widen else narrow).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("__s")
    )
    hit_ids = (
        exploded.join(F.broadcast(eval_shingles), "__s", "leftsemi")
        .select(id_col)
        .distinct()
    )
    if mode == "drop":
        return train.join(hit_ids, id_col, "left_anti")
    return train.join(
        hit_ids.withColumn("__hit", F.lit(True)), id_col, "left"
    ).withColumn("contaminated", F.coalesce(F.col("__hit"), F.lit(False))).drop("__hit")


def decontaminate_spans(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """SPAN-level decontamination: instead of dropping every document
    that shares an n-gram with the eval set (:func:`decontaminate` —
    which throws away a book because one quote leaked), remove only the
    TOKENS covered by a contaminated n-gram and keep the rest. This is
    the standard production trade: doc-level dropping over-deletes by
    orders of magnitude on long documents, span removal keeps the
    uncontaminated mass.

    Returns one row per training document:
    ``(id, clean_text, n_tokens_kept, n_tokens_removed)`` — clean_text
    is the surviving tokens joined by single spaces (whitespace is
    normalized by reconstruction, the same contract as x28's chunk
    reassembly).

    Plan shape: the eval n-gram set broadcasts (benchmark-sized, as in
    :func:`decontaminate`); training-side work is two posexplodes
    (tokens with index, n-grams with start), a broadcast semi-join to
    find contaminated starts, a sequence-explode of each start into its
    n covered indices, one left join on (doc, index), and one grouped
    reassembly — every shuffle is keyed by the document id and carries
    token-sized rows. No Python UDFs anywhere.
    """
    ev = (
        eval_df.select(
            F.explode(word_ngrams_all(F.col(text_col), n)).alias("__g")
        ).distinct()
    )
    base = fan_out(train.select(id_col, text_col))
    tok = base.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("__i0", "__tok"),
    ).select(id_col, (F.col("__i0") + 1).alias("__idx"), "__tok")
    starts = (
        base.select(
            F.col(id_col),
            F.posexplode(word_ngrams_all(F.col(text_col), n)).alias("__s0", "__g"),
        )
        .join(F.broadcast(ev), "__g", "leftsemi")
        .select(id_col, (F.col("__s0") + 1).alias("__s"))
    )
    covered = (
        starts.select(
            id_col,
            F.explode(
                F.sequence(F.col("__s"), F.col("__s") + F.lit(n - 1))
            ).alias("__idx"),
        )
        .distinct()
        .withColumn("__cov", F.lit(True))
    )
    joined = tok.join(covered, [id_col, "__idx"], "left")
    return joined.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__cov").isNull(),
                            F.struct("__idx", "__tok"),
                        )
                    )
                ),
                lambda s: s["__tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.sum(F.when(F.col("__cov").isNull(), 1).otherwise(0)).alias(
            "n_tokens_kept"
        ),
        F.sum(F.when(F.col("__cov").isNotNull(), 1).otherwise(0)).alias(
            "n_tokens_removed"
        ),
    )
