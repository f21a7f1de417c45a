"""Bucketed range join — scalable time-interval joins.

SURVEY.md §2.3 lists theta/range/interval joins as absent from the
reference; they're essential for event-correlation workloads ("which
purchases followed an error within an hour"). The naive form,

    L JOIN R ON L.key = R.key AND R.ts > L.ts AND R.ts <= L.ts + W,

plans as an equi-join on ``key`` whose non-equi residual re-explodes
inside hot keys — or, keyless, a BroadcastNestedLoopJoin: both die at
100 TB.

The bucketed rewrite makes the time dimension part of the equi-key:
bucket both sides by ``W``-sized time cells, explode the left row into
the two cells its window can touch (its own and the next), equi-join on
(key, bucket), then apply the exact range predicate as a post-filter.
Shuffle volume is 2·|L| + |R| rows hashed on (key, bucket) — ordinary
equi-join economics, AQE-splittable — and the residual comparison runs
only within a cell instead of within a whole key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.functions.scalars import ts_micros

_BUCKET = "__range_bucket"


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Inner-join pairs where ``right_ts`` falls in the half-open
    interval ``(left_ts, left_ts + window_seconds]`` and the ``on``
    keys match. Column sets must be disjoint apart from ``on``.

    The bucket width equals the window, so a left row's interval spans
    at most two cells — the smallest constant explosion factor (2×)
    that keeps the exact predicate local to a cell.
    """
    on = list(on)
    w_us = window_seconds * 1_000_000

    lb = F.floor(ts_micros(left_ts) / w_us)
    ls = left.withColumn(_BUCKET, F.explode(F.array(lb, lb + 1)))
    rs = right.withColumn(
        _BUCKET, F.floor(ts_micros(right_ts) / w_us)
    )
    return (
        ls.join(rs, [*on, _BUCKET])
        .filter(
            (F.col(right_ts) > F.col(left_ts))
            & (
                ts_micros(right_ts)
                <= ts_micros(left_ts) + w_us
            )
        )
        .drop(_BUCKET)
    )


_IVL_BLOCK = "__ivl_block"


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    block_size: int,
) -> DataFrame:
    """Inner-join pairs whose half-open NON-NEGATIVE integer intervals
    ``[left_lo, left_hi)`` and ``[right_lo, right_hi)`` overlap and
    whose ``on`` keys match — the two-interval sibling of
    :func:`bucketed_range_join` (whose right side is a point). Column
    sets must be disjoint apart from ``on``. Empty intervals
    (``hi <= lo``) are dropped on both sides: they cannot overlap
    anything, and pruning them keeps the block ``sequence`` ascending.

    Each interval explodes into the ``block_size``-wide cells it
    spans (``width DIV block + 1`` rows), cells equi-join as part of
    the key, the exact overlap predicate runs within a cell, and a
    pair is emitted ONLY in the cell containing the overlap's start
    (``GREATEST(lo_l, lo_r) DIV block`` — a cell both sides span by
    construction), so no distinct pass is needed. Shuffle volume is
    ordinary equi-join economics — Σ(width)/block + |rows| per side —
    and AQE can split a hot cell like any hot hash key. Intervals must
    be non-negative: integer DIV truncates toward zero, so a negative
    ``lo`` would land in the wrong cell.
    """
    on = list(on)
    block = int(block_size)
    if block <= 0:
        raise ValueError(f"block_size must be positive, got {block_size}")

    def cells(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.filter(F.expr(f"({hi}) > ({lo})")).withColumn(
            _IVL_BLOCK,
            F.explode(
                F.expr(f"sequence(({lo}) DIV {block}, (({hi}) - 1) DIV {block})")
            ),
        )

    anchor = F.expr(f"GREATEST({left_lo}, {right_lo}) DIV {block}")
    return (
        cells(left, left_lo, left_hi)
        .join(cells(right, right_lo, right_hi), [*on, _IVL_BLOCK])
        .filter(
            (F.col(left_lo) < F.col(right_hi))
            & (F.col(right_lo) < F.col(left_hi))
            & (F.col(_IVL_BLOCK) == anchor)
        )
        .drop(_IVL_BLOCK)
    )
