"""Deterministic global shuffle — reproducible training-data ordering.

A training run needs the corpus in a pseudo-random order that is (a)
reproducible from a seed, (b) independent of file layout / partition
count, and (c) assignable as a contiguous global position so a run can
resume from "example N". The reference has nothing like it (its serving
load is order-free, TableTransform.py:26-29); for an LLM-data pipeline
it is the step between "corpus frozen" and "training starts".

The shuffle key is content-derived — ``md5(key ':' seed)`` — so the
order is a pure function of (keys, seed), not of cluster layout. The
contiguous position is the classic two-phase distributed enumeration,
all DataFrame ops:

1. range-partition + sort by (shuffle_key, key) — Spark's sort
   machinery places each row in a globally ordered range partition;
2. per-partition ``row_number`` (a window PARTITIONED by the range
   partition id — parallel, no single-partition global window);
3. add each partition's starting offset, computed from the tiny
   per-partition count table (|partitions| rows) with a running-sum
   window and broadcast-joined back.

Scale: the only data-sized movement is the range exchange (exactly the
shuffle a 100 TB sort pays, AQE-splittable); everything afterward is
map-side. A naive ``row_number() OVER (ORDER BY ...)`` funnels the
entire corpus through ONE task — WindowExec warns precisely because it
cannot scale — which is what the two-phase form avoids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_KEY = "__shuffle_key"
_PART = "__shuffle_part"
_LOCAL = "__local_pos"
_OFFSET = "__part_offset"


def shuffle_key(key_col: str, seed: int) -> F.Column:
    """Content-derived shuffle key: md5 of ``key ':' seed``. Stable
    across engines (DuckDB md5 produces the identical hex digest, so
    the order is oracle-checkable)."""
    return F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}"))
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every row a contiguous global ``shuffle_pos`` (1-based)
    in the seed-determined pseudo-random order.

    ``key_col`` must be unique (it tie-breaks hash collisions, making
    the order total). Output = input columns + ``shuffle_pos``.
    """
    keyed = df.withColumn(_KEY, shuffle_key(key_col, seed))
    parts = [F.col(_KEY), F.col(key_col)]
    ranged = (
        keyed.repartitionByRange(num_partitions, *parts)
        if num_partitions
        else keyed.repartitionByRange(*parts)
    ).sortWithinPartitions(*parts)
    marked = ranged.withColumn(_PART, F.spark_partition_id())

    local_w = Window.partitionBy(_PART).orderBy(*parts)
    # Checkpoint BEFORE forking the lineage into the offsets side table
    # and the main branch: both must observe the SAME range-partitioner
    # sampling and partition-id assignment. Without it the two branches
    # re-evaluate the exchange independently — correct only as long as
    # every upstream source is deterministic, which a caller can't
    # always promise (same discipline as components.py / graphrank.py).
    local = marked.withColumn(_LOCAL, F.row_number().over(local_w)).localCheckpoint(
        eager=True
    )

    # |partitions|-row side table: each range partition's start offset.
    counts = local.groupBy(_PART).agg(F.count("*").alias("__n"))
    offset_w = (
        Window.orderBy(_PART)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    offsets = counts.select(
        _PART,
        F.coalesce(F.sum("__n").over(offset_w), F.lit(0)).alias(_OFFSET),
    )

    return (
        local.join(F.broadcast(offsets), _PART)
        .withColumn(
            "shuffle_pos", (F.col(_OFFSET) + F.col(_LOCAL)).cast("long")
        )
        .drop(_KEY, _PART, _LOCAL, _OFFSET)
    )
