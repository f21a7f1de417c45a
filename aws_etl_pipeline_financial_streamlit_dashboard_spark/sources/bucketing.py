"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of the fact⋈fact join (lineitem⋈orders on
orderkey) is shuffling both sides on every query. Bucketing pays that
shuffle once at write time: both tables hash-clustered into the same
number of buckets on the join key mean Catalyst plans the join with
ZERO exchanges — each task reads bucket i of both sides. The reference
has no equivalent (pandas joins in memory); this is the Spark-native
materialization strategy for its precomputed serving tables
(README.md:29 'reduce the computation time when refreshing').

Rules that make bucketing actually work (each is load-bearing):
- identical bucket counts on both tables (or an integer multiple);
- join keys == bucket keys, same types;
- ``sortBy`` on the key keeps bucket files key-sorted (cheap per-task
  re-sort at scan; Spark ignores the sort metadata itself since
  SPARK-28632, but sorted runs still speed the re-sort and compress
  better);
- bucket count sized so one bucket of the big table fits an executor
  (at 100 TB lineitem and 1024 buckets: ~100 GB/bucket → too big, use
  8-16k buckets; local tests use 8).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) table.

    Bucketing requires the table catalog (``saveAsTable``): the bucket
    spec lives in table metadata, which a bare ``parquet(path)`` write
    cannot carry. ``path`` makes it an external table.
    """
    bucket_cols = list(bucket_cols)
    # repartition on the bucket hash first: each task then owns exactly
    # one bucket, giving one file per bucket. Without this, every write
    # task emits a file into every bucket (task_count × n_buckets small
    # files at scale) AND the scan-side sort elimination is lost —
    # Spark only trusts sortBy order for single-file buckets.
    df = df.repartition(n_buckets, *bucket_cols)
    writer = df.write.mode("overwrite").bucketBy(
        n_buckets, bucket_cols[0], *bucket_cols[1:]
    )
    sort_cols = list(sort_cols) if sort_cols else bucket_cols
    writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
