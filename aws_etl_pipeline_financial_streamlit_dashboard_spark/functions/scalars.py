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


def ts_micros(ts: Column | str) -> Column:
    """Epoch microseconds from either TIMESTAMP or TIMESTAMP_NTZ.

    Parquet timestamps without isAdjustedToUTC read as TIMESTAMP_NTZ
    under Spark's NTZ inference, and ``unix_micros`` is tz-strict
    (rejects NTZ). The cast is a no-op for TIMESTAMP and interprets
    NTZ wall-clock in the session timezone (UTC here) — matching
    DuckDB's epoch_us on naive timestamps — so one expression serves
    both storage flavors.
    """
    if isinstance(ts, str):
        ts = F.col(ts)
    return F.unix_micros(ts.cast("timestamp"))


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
# often do). The fix must be order-independent AND fast: Spark's
# decimal(38,10) sum is exact but BigDecimal-backed (non-vectorized;
# measured ~4× slower than a long sum on the q17 aggregate set), so
# instead each row is quantized to FIXED POINT split across two longs —
# whole units in one, half-up-rounded micro-units (1e-6) of the
# fractional part in the other. Long sums are exact, order-independent,
# and stay in whole-stage codegen; the recombination
# (sum_hi + sum_lo/1e6) is deterministic double arithmetic on identical
# inputs in both engines, so parity is bitwise.
#
# Scale bounds (per GROUP, signed 64-bit):
# - hi overflows at |Σ floor(x)| > 9.2e18 whole units — a 100 TB TPC-H
#   q17 group sums ~4e15, three orders of magnitude of headroom (a
#   micro-unit-only encoding would cap at 9.2e12 and NOT survive);
# - lo sums < 1e6 per row → overflows past 9.2e12 ROWS per group —
#   at 100 TB (~6e11 lineitem rows) still >10× headroom.
# Precision: quantization alters each row by ≤5e-7, so a k-row group
# sum drifts ≤5e-7·k from the exact decimal sum (~0.3 units at 6e5
# rows, far below the 2-decimal display rounding) — and the oracle twin
# applies the identical quantization, so cross-engine results remain
# bitwise identical regardless.
# ---------------------------------------------------------------------------

_MICRO = 1_000_000.0


def _hi_lo(col: Column) -> tuple[Column, Column]:
    """Fixed-point split of a double column: (whole units, half-up
    micro-units of the fractional part). frac ∈ [0,1) for negatives too,
    so both parts stay exactly representable."""
    hi = F.floor(col).cast("long")
    lo = F.floor((col - F.floor(col)) * _MICRO + F.lit(0.5)).cast("long")
    return hi, lo


def dec_sum(col: Column, n: int = 2) -> Column:
    """Order-independent SUM via the fixed-point hi/lo long split,
    HALF_UP-rounded to ``n`` decimals as double."""
    if isinstance(col, str):
        col = F.col(col)
    hi, lo = _hi_lo(col)
    total = F.sum(hi).cast("double") + F.sum(lo).cast("double") / _MICRO
    return round_half_up(total, n)


def stable_avg(col: Column, n: int = 2) -> Column:
    """Order-independent AVG: fixed-point sum divided by the non-null
    count, HALF_UP-rounded to ``n``. Null-skipping like SQL AVG."""
    if isinstance(col, str):
        col = F.col(col)
    hi, lo = _hi_lo(col)
    total = F.sum(hi).cast("double") + F.sum(lo).cast("double") / _MICRO
    return round_half_up(total / F.count(col), n)


def sql_dec_sum(expr: str, n: int = 2) -> str:
    """DuckDB twin of :func:`dec_sum` (identical quantization, so sums
    are bitwise identical; SUM(BIGINT)→HUGEINT→DOUBLE is exact here)."""
    e = f"({expr})"
    hi = f"SUM(CAST(FLOOR({e}) AS BIGINT))"
    lo = f"SUM(CAST(FLOOR(({e} - FLOOR({e})) * 1000000.0 + 0.5) AS BIGINT))"
    return sql_round(f"(CAST({hi} AS DOUBLE) + CAST({lo} AS DOUBLE) / 1000000.0)", n)


def sql_stable_avg(expr: str, n: int = 2) -> str:
    """DuckDB twin of :func:`stable_avg`."""
    e = f"({expr})"
    hi = f"SUM(CAST(FLOOR({e}) AS BIGINT))"
    lo = f"SUM(CAST(FLOOR(({e} - FLOOR({e})) * 1000000.0 + 0.5) AS BIGINT))"
    total = f"(CAST({hi} AS DOUBLE) + CAST({lo} AS DOUBLE) / 1000000.0)"
    return sql_round(f"{total} / COUNT({e})", n)


def dexpr(sql: str) -> Column:
    """``F.expr`` wrapper forcing a DOUBLE result for the portable
    sql_* aggregate strings: Spark parses the literal ``100.0`` as
    DECIMAL(4,1) (DuckDB: DOUBLE), so the outermost division would
    decimal-ize the column. The cast restores the Column-DSL type;
    the value is bit-identical (n/100 is exact in double for
    |n| < 2⁵³)."""
    return F.expr(f"CAST(({sql}) AS DOUBLE)")
