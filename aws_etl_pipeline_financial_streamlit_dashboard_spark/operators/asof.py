"""As-of (point-in-time) join — the temporal operator the reference
approximates with its latest-quarter argmax reduction (cleaning.py:62-63
pairs each ticker with its most recent statement; SURVEY.md §2.3 notes
as-of as the nearest missing join family).

Implemented as the scalable union-merge algorithm, not an inequality
join: an ``ON l.key = r.key AND l.ts >= r.ts`` range join degenerates to
a per-key nested loop (O(|L|·|R|) within a key — hopeless when one key
holds millions of rows at 100 TB). Union-merge instead:

1. tag both inputs and union them (no join),
2. one shuffle: window partitioned by key, ordered by (ts, side),
3. forward-fill the right side's value columns with
   ``last(col, ignoreNulls=True)`` over UNBOUNDED PRECEDING..CURRENT,
4. keep only left-side rows.

Cost is a single shuffle of |L|+|R| rows on the equi-key — the same
shuffle a plain equi-join would pay — and the window scan is linear
per key. Skewed keys split via AQE like any other shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance: Column | None = None,
) -> DataFrame:
    """For each ``left`` row, attach the ``value_cols`` of the latest
    ``right`` row with the same ``on`` keys and ``right_ts <= left_ts``
    (left-outer semantics: no prior right row → NULLs).

    A right row whose timestamp *equals* the left's matches (``>=``,
    DuckDB/pandas ``merge_asof`` default); the ``side`` ordering key
    places right rows before left rows at identical timestamps.

    ``tolerance`` (optional duration column/literal) voids matches older
    than ``left_ts - tolerance``, evaluated after the fill so it adds no
    extra shuffle.
    """
    on = list(on)
    value_cols = list(value_cols)
    left_cols = [c for c in left.columns if c not in on and c != left_ts]

    rs = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    ls = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in value_cols
        ],
        *left_cols,
    )

    w = (
        Window.partitionBy(*on)
        .orderBy(_TS, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = [F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c) for c in value_cols]
    matched_ts = F.last(
        F.when(F.col(_SIDE) == 0, F.col(_TS)), ignorenulls=True
    ).over(w)

    out = ls.unionByName(rs).select(
        *on,
        F.col(_TS),
        F.col(_SIDE),
        matched_ts.alias("__match_ts"),
        *left_cols,
        *filled,
    )
    if tolerance is not None:
        out = out.select(
            *on,
            _TS,
            _SIDE,
            "__match_ts",
            *left_cols,
            *[
                F.when(
                    F.col("__match_ts") >= F.col(_TS) - tolerance, F.col(c)
                ).alias(c)
                for c in value_cols
            ],
        )
    return (
        out.filter(F.col(_SIDE) == 1)
        .drop(_SIDE, "__match_ts")
        .withColumnRenamed(_TS, left_ts)
    )
