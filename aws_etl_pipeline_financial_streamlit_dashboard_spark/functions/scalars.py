"""Scalar column helpers (SURVEY.md §2.8 F1-F12).

The reference's scalar surface is tiny (casts, upper/lower, strftime,
+−×÷); these helpers pin the two semantics that differ between pandas
and SQL engines:

- month keys stay zero-padded 'YYYY-MM' strings (lexical == chrono
  sort, retrieval.py:44 / Frontend.py:78);
- division yields NULL on zero denominators (Spark/DuckDB-native),
  deviating from pandas ±inf (cleaning.py:59,87) by design
  (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def month_key(ts: Column) -> Column:
    """timestamp → 'YYYY-MM' storage key (F3; retrieval.py:44)."""
    return F.date_format(ts, "yyyy-MM")


def month_display(month: Column) -> Column:
    """'YYYY-MM' key → 'Mon YYYY' display format (F4+F5;
    Frontend.py:57-58)."""
    return F.date_format(F.to_date(month, "yyyy-MM"), "MMM yyyy")


def safe_div(num: Column, den: Column) -> Column:
    """NULL-on-zero division — the engine's pinned divide-by-zero
    semantic (F8/F10; cleaning.py:59,87)."""
    return num / F.nullif(den, F.lit(0))


def round_half_up(col: Column, n: int) -> Column:
    """Engine-portable HALF_UP rounding: floor(x·10ⁿ + 0.5)/10ⁿ.

    Spark's ROUND is HALF_UP, DuckDB's is HALF_EVEN on doubles — a
    value landing exactly on a half boundary would hash-mismatch the
    oracle. This formula is the same double arithmetic in both engines
    (oracle side: functions.oracle.sql_round), so results are bitwise
    identical. Valid while |x|·10ⁿ < 2⁵³.
    """
    if isinstance(col, str):
        col = F.col(col)
    scale = float(10**n)
    return F.floor(col * scale + F.lit(0.5)) / scale


def sql_round(expr: str, n: int) -> str:
    """DuckDB-side twin of :func:`round_half_up` for oracle SQL."""
    scale = float(10**n)
    return f"FLOOR(({expr}) * {scale} + 0.5) / {scale}"


# ---------------------------------------------------------------------------
# Exact (order-independent) aggregation for cross-engine parity.
#
# Distributed float SUM/AVG is summation-order-dependent: at sf0.01 the
# Spark and DuckDB results differ by ~1e-8, which flips rounded output
# when the true value sits exactly on a rounding boundary (money values
# often do). Casting each row to DECIMAL(38,10) first makes the sum
# exact and order-independent — bitwise identical in both engines —
# and every value derived from it (avg = sum/count, final rounding) is
# then deterministic double arithmetic on identical inputs.
# ---------------------------------------------------------------------------

_DEC = "decimal(38,10)"


def dec_sum(col: Column, n: int = 2) -> Column:
    """Exact SUM: per-row cast to decimal(38,10) → exact decimal sum →
    HALF_UP round to ``n`` → double."""
    if isinstance(col, str):
        col = F.col(col)
    return F.round(F.sum(col.cast(_DEC)), n).cast("double")


def stable_avg(col: Column, n: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum cast to double, divided
    by the non-null count, HALF_UP-rounded to ``n``. Null-skipping like
    SQL AVG."""
    if isinstance(col, str):
        col = F.col(col)
    return round_half_up(
        F.sum(col.cast(_DEC)).cast("double") / F.count(col), n
    )


def sql_dec_sum(expr: str, n: int = 2) -> str:
    """DuckDB twin of :func:`dec_sum`."""
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(38,10))), {n}) AS DOUBLE)"


def sql_stable_avg(expr: str, n: int = 2) -> str:
    """DuckDB twin of :func:`stable_avg`."""
    inner = (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,10))) AS DOUBLE) / COUNT({expr})"
    )
    return sql_round(inner, n)
