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

from .lineage import truncate_lineage

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
    reliable: bool = False,
) -> DataFrame:
    """Assign every row a contiguous global ``shuffle_pos`` (1-based)
    in the seed-determined pseudo-random order.

    ``key_col`` must be unique (it tie-breaks hash collisions, making
    the order total). Output = input columns + ``shuffle_pos``.
    """
    keyed = df.withColumn(_KEY, shuffle_key(key_col, seed))
    return global_rank(
        keyed,
        [F.col(_KEY), F.col(key_col)],
        rank_col="shuffle_pos",
        num_partitions=num_partitions,
        reliable=reliable,
    ).drop(_KEY)


def global_rank(
    df: DataFrame,
    order_cols,
    rank_col: str = "global_rank",
    num_partitions: int | None = None,
    reliable: bool = False,
) -> DataFrame:
    """Contiguous 1-based global rank in ``order_cols`` order WITHOUT a
    single-partition window (an ORDER-BY-only ``Window`` collapses the
    whole table onto one task — the scale-killer this operator exists
    to avoid).

    Two-phase enumeration: range-partition + per-partition sort on the
    order columns, local ``row_number`` within each range partition,
    then one |partitions|-row broadcast of cumulative start offsets.
    The order must be total (include a unique tie-break column) for
    the rank to be deterministic. This is the engine's building block
    for every global-order computation: deterministic_shuffle (x42),
    NTILE-at-scale (q59), zorder rank-normalization.
    """
    parts = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *parts)
        if num_partitions
        else df.repartitionByRange(*parts)
    ).sortWithinPartitions(*parts)
    marked = ranged.withColumn(_PART, F.spark_partition_id())

    local_w = Window.partitionBy(_PART).orderBy(*parts)
    # Checkpoint BEFORE forking the lineage into the offsets side table
    # and the main branch: both must observe the SAME range-partitioner
    # sampling and partition-id assignment. Without it the two branches
    # re-evaluate the exchange independently — correct only as long as
    # every upstream source is deterministic, which a caller can't
    # always promise (same discipline as components.py / graphrank.py).
    # reliable=True swaps the executor-local checkpoint for a durable
    # one (operators/lineage.py): the checkpointed frame here is
    # CORPUS-SIZED, so on a preemptible cluster a lost executor would
    # otherwise kill the whole enumeration.
    local = truncate_lineage(
        marked.withColumn(_LOCAL, F.row_number().over(local_w)), reliable
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
        .withColumn(rank_col, (F.col(_OFFSET) + F.col(_LOCAL)).cast("long"))
        .drop(_PART, _LOCAL, _OFFSET)
    )


def ntile_at_scale(
    df: DataFrame,
    order_cols,
    k: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
    reliable: bool = False,
) -> DataFrame:
    """SQL-standard NTILE(k) without the single-partition window: the
    bucket is a closed-form function of the global rank and the total
    count (first n mod k buckets get one extra row), both computed by
    :func:`global_rank`'s two-phase enumeration plus a 1-row broadcast
    of the total. Bit-identical to engine NTILE for a total order."""
    ranked = global_rank(df, order_cols, "__r", num_partitions, reliable=reliable)
    total = ranked.groupBy().agg(F.count("*").alias("__nt"))
    q = "(__nt div {k})".format(k=k)
    rem = "(__nt % {k})".format(k=k)
    big = f"(({q} + 1) * {rem})"  # rows covered by the larger buckets
    # When n < k, q = 0 and every row satisfies the THEN branch (rank ≤
    # (q+1)·rem = n), so the ELSE divisor is never REACHED — but an
    # ANSI-mode engine may still EVALUATE both branches eagerly, so the
    # divisor is guarded explicitly rather than relying on lazy CASE
    # (ADVICE r3). GREATEST(q, 1) never changes a reached result.
    bucket = (
        f"CASE WHEN __r <= {big} THEN (__r - 1) div ({q} + 1) + 1 "
        f"ELSE {rem} + (__r - {big} - 1) div GREATEST({q}, 1) + 1 END"
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(out_col, F.expr(bucket).cast("int"))
        .drop("__r", "__nt")
    )
