"""Stratified sampling and corpus mixing — the composition ops of a
training-data pipeline (after filtering and dedup comes "mix sources
to a target recipe").

Both are seeded: resampling with the same seed is reproducible, which
is what makes a data recipe auditable. Randomness is per-row Bernoulli
(``sampleBy``) — no shuffle, no coordination; each task draws
independently, so the realized fraction converges on the target with
O(1/√n) error at any scale.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (``sampleBy``): strata absent from
    ``fractions`` are dropped (fraction 0) — the 'keep 10% of web, all
    of books' recipe shape."""
    return df.sampleBy(strata_col, dict(fractions), seed=seed)


def mix_corpora(
    df: DataFrame,
    source_col: str,
    token_col: str,
    target_weights: Mapping[str, float],
    seed: int = 42,
) -> DataFrame:
    """Down-sample sources so realized token shares approximate
    ``target_weights`` (normalized). Sources needing MORE than they
    have are kept whole (fraction capped at 1.0 — this operator never
    up-samples; repeat-epoch upsampling is a training-loop decision,
    not a data-prep one).

    Per-source keep-fractions are computed INSIDE the DAG — the same
    |sources|-row aggregate + bounded window + broadcast-join-back
    shape as :func:`mix_corpora_deterministic` — so the recipe is one
    lazy plan with no driver ``collect()`` and no extra job ahead of
    the real one at 100 TB. Acceptance stays per-row Bernoulli
    (``rand(seed)``, the same per-partition-seeded generator
    ``sampleBy`` uses): deterministic under (seed, partition layout),
    which is the contract the seeded API always had. Sources absent
    from ``target_weights`` are dropped; an all-zero weight overlap
    yields the empty frame (every fraction is NULL-joined away).
    """
    from pyspark.sql import Window

    z = sum(target_weights.values())
    if not z:
        return df.limit(0)
    shares = [(s, w / z) for s, w in target_weights.items()]
    share_df = F.broadcast(
        df.sparkSession.createDataFrame(
            shares, f"{source_col} string, __share double"
        )
    )
    totals = df.groupBy(source_col).agg(F.sum(token_col).alias("__toks"))
    grand_w = Window.partitionBy()  # |sources| rows — bounded window
    fractions = (
        totals.join(share_df, source_col)
        .withColumn("__grand", F.sum("__toks").over(grand_w))
        .select(
            source_col,
            F.least(
                F.lit(1.0),
                (F.col("__grand") * F.col("__share"))
                / F.greatest(F.col("__toks"), F.lit(1)).cast("double"),
            ).alias("__frac"),
        )
    )
    return (
        df.join(F.broadcast(fractions), source_col)
        .filter(F.rand(seed) < F.col("__frac"))
        .drop("__frac")
    )


def exact_stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample (no RNG state).

    Bernoulli sampling (above) hits a TARGET fraction with O(1/√n)
    noise; some consumers need exactly k rows per stratum (eval slices,
    per-source spot-check panels, balanced annotation batches). Rank
    rows within each stratum by a content-derived hash —
    ``md5(key ':' seed)``, uniform over keys, reproducible from the
    seed, layout-independent — and keep the first k.

    One hash-partitioned window shuffle on ``strata_col``; no global
    sort, no driver coordination. A skewed stratum is one window
    partition — for pathological single-stratum skew, pre-aggregate
    with a salted top-k (operators/skew) instead. Output adds
    ``sample_rank`` (1..k within each stratum).
    """
    from pyspark.sql import Window

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.shuffle import (
        shuffle_key,
    )

    w = Window.partitionBy(strata_col).orderBy(
        shuffle_key(key_col, seed), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def hash_stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: Mapping[str, float],
    seed: int = 42,
) -> DataFrame:
    """Per-stratum FRACTIONAL sample with no RNG state — the fully
    deterministic, cross-engine-reproducible form of
    :func:`stratified_sample` (which draws from Spark's per-task RNG
    and so can only ever be rows-only-checked).

    Each row's 32-bit md5 bucket of ``key ':' seed`` is compared to
    ``fraction · 2³²``: uniform over keys, so the realized fraction
    converges on the target with the same O(1/√n) error as Bernoulli
    sampling, but membership is a pure function of content — identical
    across engines, reruns, cluster sizes, and partitionings (the
    property that makes a data recipe auditable). Strata absent from
    ``fractions`` are dropped, matching ``stratified_sample``.

    Narrow transform: per-row hash + comparison against a broadcast
    CASE, zero shuffle at any scale.
    """
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    threshold = F.lit(None).cast("long")
    for name, frac in fractions.items():
        threshold = F.when(
            F.col(strata_col) == name, F.lit(int(frac * 4294967296))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def mix_corpora_deterministic(
    df: DataFrame,
    source_col: str,
    token_col: str,
    key_col: str,
    target_weights: Mapping[str, float],
    seed: int = 42,
) -> DataFrame:
    """Corpus mixing with NO RNG state and NO driver-side action — the
    fully-deterministic, oracle-checkable variant of :func:`mix_corpora`.

    Differences from the Bernoulli form:

    - acceptance is a hash threshold — keep row ⇔
      ``md5(key ':' seed)``'s first 32 bits, as a fraction of 2³²,
      fall below the source's keep-fraction. Reproducible from (keys,
      seed) alone, layout-independent, and computable by any engine;
    - per-source token totals and keep-fractions are computed INSIDE
      the DAG (a |sources|-row aggregate with its grand total windowed
      over it, broadcast-joined back) instead of ``collect()``-ed to
      the driver — no extra job before the real one at 100 TB.

    Never up-samples (fraction capped at 1.0). Normalized weights are
    embedded as literals so both engines run identical double
    arithmetic.
    """
    from pyspark.sql import Window

    z = sum(target_weights.values())
    shares = [(s, w / z) for s, w in target_weights.items()]
    share_df = F.broadcast(
        df.sparkSession.createDataFrame(shares, f"{source_col} string, __share double")
    )

    totals = df.groupBy(source_col).agg(F.sum(token_col).alias("__toks"))
    grand_w = Window.partitionBy()  # |sources| rows — bounded window
    fractions = (
        totals.join(share_df, source_col)
        .withColumn("__grand", F.sum("__toks").over(grand_w))
        .select(
            source_col,
            F.least(
                F.lit(1.0),
                (F.col("__grand") * F.col("__share"))
                / F.greatest(F.col("__toks"), F.lit(1)).cast("double"),
            ).alias("__frac"),
        )
    )

    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    return (
        df.join(F.broadcast(fractions), source_col)
        .filter(bucket < F.col("__frac"))
        .drop("__frac")
    )
