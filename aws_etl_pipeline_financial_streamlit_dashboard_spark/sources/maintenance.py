"""Lake maintenance: small-file compaction and range clustering.

Incremental pipelines (streaming sinks, per-batch appends, partition
upserts) accrete small files; at 100 TB the file count — not the byte
count — becomes the scan bottleneck (driver-side listing, one task per
tiny file, per-file footer reads). The reference never hits this (it
rewrites everything); an incremental engine must compact.

Both operations are plain reads+rewrites — no table format dependency —
and idempotent (rewrite to a temp dir, swap on success would be the
production finish; here the caller owns the swap).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 << 20


def plan_compaction(path: str, target_bytes: int = TARGET_FILE_BYTES) -> dict:
    """Inspect a parquet directory: file count, total bytes, and the
    output file count a compaction would produce. Driver-side listing
    only — no Spark job."""
    files = []
    for root, _dirs, names in os.walk(path):
        files.extend(
            os.path.join(root, n) for n in names if n.endswith(".parquet")
        )
    total = sum(os.path.getsize(f) for f in files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "target_files": max(1, -(-total // target_bytes)),
    }


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = TARGET_FILE_BYTES,
) -> dict:
    """Rewrite ``src`` into ``dst`` with ~``target_bytes`` files.

    ``coalesce`` (not ``repartition``): compaction must not pay a
    shuffle — tasks just concatenate input splits. Returns the plan
    stats for observability.
    """
    stats = plan_compaction(src, target_bytes)
    df = spark.read.parquet(src)
    df.coalesce(stats["target_files"]).write.mode("overwrite").parquet(dst)
    return stats


def cluster_by_range(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    n_files: int,
) -> None:
    """Range-cluster a table on ``cluster_cols`` so parquet min/max
    stats become selective: ``repartitionByRange`` puts disjoint key
    ranges in each file and the within-file sort tightens row-group
    stats — scans with predicates on the cluster columns skip whole
    files/row-groups (the poor man's z-order, exact for one column,
    good for correlated ones).
    """
    cols = [F.col(c) for c in cluster_cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_key(cols: Sequence[str], bits: int = 16) -> F.Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column's bucket so a sort by the key gives EVERY clustered column
    locality at once — per-file min/max spans shrink to ~n^(1/k) of the
    domain for k columns, vs exact-for-one / useless-for-others under
    lexicographic range clustering.

    Callers pass pre-bucketed non-negative ints (see
    :func:`cluster_by_zorder`, which rank-normalizes arbitrary columns
    first). The interleave is a generated shift/or chain — pure codegen
    arithmetic, one expression, no UDF."""
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(
                f"shiftleft(shiftright(CAST({c} AS BIGINT), {i}) & 1, {i * k + j})"
            )
    return F.expr("(" + " | ".join(terms) + ")")


def cluster_by_zorder(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Z-order-cluster a table on ``cluster_cols`` (multi-column data
    skipping): each column is rank-normalized to ``bits`` bits with
    ``ntile`` (distribution-proof — heavy skew still fills buckets
    evenly), the buckets interleave into a Morton key, and files are
    range-partitioned + sorted by that key so parquet min/max stats
    are selective on EVERY clustered column simultaneously.

    Cost shape at 100 TB: each column's rank-normalization runs
    through ``operators/shuffle.ntile_at_scale`` — a range exchange +
    per-partition enumeration, NEVER Spark's ORDER-BY-only ntile
    window (which collapses the whole table onto one task); clustering
    costs ~k range sorts + the final range write, PLUS transient
    executor-local storage: each ``global_rank`` localCheckpoints its
    ranged frame, so up to k materialized copies of the table exist
    during the build until the ContextCleaner frees them after the
    job — size executor disks for the build accordingly. It's the
    pay-once layout step whose dividend is every later scan's
    skipped IO (same amortization as bucketing, q34). Ties within a cluster column get
    arbitrary-but-stable-size buckets (no tie-break column needed —
    bucket SPANS, not row identity, are what min/max stats read).
    """
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.shuffle import (
        ntile_at_scale,
    )

    work = df
    bucket_cols = []
    n_buckets = 1 << bits
    for c in cluster_cols:
        b = f"__zb_{c}"
        work = ntile_at_scale(work, [c], n_buckets, out_col=b).withColumn(
            b, F.col(b) - 1
        )
        bucket_cols.append(b)
    work = work.withColumn("__zkey", zorder_key(bucket_cols, bits))
    (
        work.repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *bucket_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
