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
    direction: str = "backward",
) -> DataFrame:
    """For each ``left`` row, attach the ``value_cols`` of the nearest
    ``right`` row with the same ``on`` keys — the latest with
    ``right_ts <= left_ts`` (``direction="backward"``, default) or the
    earliest with ``right_ts >= left_ts`` (``direction="forward"``).
    Left-outer semantics: no qualifying right row → NULLs.

    A right row whose timestamp *equals* the left's matches (``>=``,
    DuckDB/pandas ``merge_asof`` default); the ``side`` ordering key
    places right rows on the match-eligible side of left rows at
    identical timestamps. Forward is the same union-merge with the
    window frame and fill mirrored (CURRENT..UNBOUNDED FOLLOWING,
    ``first`` instead of ``last``) — still one shuffle.

    ``tolerance`` (optional duration column/literal) voids matches
    farther than ``tolerance`` from ``left_ts``, evaluated after the
    fill so it adds no extra shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    backward = direction == "backward"
    on = list(on)
    value_cols = list(value_cols)
    left_cols = [c for c in left.columns if c not in on and c != left_ts]

    # right rows must sort on the match-eligible side of equal-ts left
    # rows: before (backward) / after (forward)
    r_side, l_side = (0, 1) if backward else (1, 0)
    rs = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(r_side).alias(_SIDE),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    ls = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(l_side).alias(_SIDE),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in value_cols
        ],
        *left_cols,
    )

    base = Window.partitionBy(*on).orderBy(_TS, _SIDE)
    if backward:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fill = F.last
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        fill = F.first
    filled = [
        fill(f"__r_{c}", ignorenulls=True).over(w).alias(c) for c in value_cols
    ]
    matched_ts = fill(
        F.when(F.col(_SIDE) == r_side, F.col(_TS)), ignorenulls=True
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
                    (
                        F.col("__match_ts") >= F.col(_TS) - tolerance
                        if backward
                        else F.col("__match_ts") <= F.col(_TS) + tolerance
                    ),
                    F.col(c),
                ).alias(c)
                for c in value_cols
            ],
        )
    return (
        out.filter(F.col(_SIDE) == l_side)
        .drop(_SIDE, "__match_ts")
        .withColumnRenamed(_TS, left_ts)
    )
