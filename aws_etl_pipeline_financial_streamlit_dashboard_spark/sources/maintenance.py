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
