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
