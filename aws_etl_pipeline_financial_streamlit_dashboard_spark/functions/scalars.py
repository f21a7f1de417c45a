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
    """Epoch microseconds of the NTZ wall clock — session-TZ-free.

    Parquet timestamps without isAdjustedToUTC read as TIMESTAMP_NTZ
    under Spark's NTZ inference, and DuckDB's ``epoch_us`` on the same
    naive value is pure wall-clock arithmetic. The earlier
    ``unix_micros(CAST(ts AS TIMESTAMP))`` form matched it only while
    the session timezone was UTC (the NTZ→LTZ cast interprets the wall
    clock in the session zone — a shifted driver environment moved
    every day/month bucket). This form decomposes the NTZ value itself
    (days since epoch, hour/minute, exact decimal seconds → micros):
    no LTZ type appears, so the result is identical under ANY session
    timezone, and equals the old expression under UTC — no parity
    change for existing entries. LTZ inputs first normalize to the
    session wall clock (cast TIMESTAMP→TIMESTAMP_NTZ), preserving the
    old UTC-session behavior for that flavor too.
    """
    if isinstance(ts, str):
        ts = F.col(ts)
    ntz = ts.cast("timestamp_ntz")
    return (
        F.unix_date(ntz.cast("date")).cast("long") * F.lit(_US_PER_DAY)
        + (F.hour(ntz) * 3600 + F.minute(ntz) * 60).cast("long")
        * F.lit(1_000_000)
        # date_part('SECOND') is DECIMAL(8,6) — ×1e6 is exact, and the
        # long cast is lossless at parquet's micro precision
        + (F.date_part(F.lit("SECOND"), ntz) * 1_000_000).cast("long")
    )


_US_PER_DAY = 86_400_000_000


def event_time(ts: Column | str) -> Column:
    """Session-TZ-invariant event-time column for streaming watermarks.

    Watermarks are tz-strict (they require TIMESTAMP, the LTZ flavor),
    but a plain ``ts.cast("timestamp")`` interprets the NTZ wall clock
    in the SESSION zone — a shifted driver timezone then moves every
    instant, every tumbling-window bucket boundary, and every emitted
    epoch value. This form pins the instant to the naive-as-UTC
    reading under ANY session timezone: :func:`ts_micros` decomposes
    the NTZ wall clock by pure arithmetic, ``timestamp_micros`` turns
    those micros into an absolute instant. Equal to the plain cast
    under a UTC session — no parity change for existing entries.
    """
    return F.timestamp_micros(ts_micros(ts))


def ntz_of_instant(ts: Column) -> Column:
    """TIMESTAMP(LTZ) instant → its UTC wall clock as TIMESTAMP_NTZ.

    The session-TZ-free inverse of :func:`event_time`: ``unix_micros``
    reads the absolute instant (no zone involved), and adding it to an
    NTZ epoch literal is pure arithmetic. Use it to RENDER streaming
    window boundaries (``date_format`` on NTZ is wall-clock-only; on
    LTZ it goes through the session zone)."""
    return F.timestamp_add(
        "MICROSECOND",
        F.unix_micros(ts),
        F.expr("TIMESTAMP_NTZ'1970-01-01 00:00:00'"),
    )


def sql_day_from_us_spark(us: str) -> str:
    """'YYYY-MM-DD' day key from non-negative epoch MICROSECONDS —
    Spark SQL text. Pure integer + Gregorian-calendar arithmetic: no
    timestamp type, no session timezone, no locale anywhere in the
    chain, so the key is identical under any driver environment (the
    ``date_format(ts, ...)`` it replaces is tz-correct only while the
    session zone matches the oracle's naive reading — this derivation
    removes that coupling entirely). Both engines truncate integer
    division toward zero (Spark DIV and DuckDB 1.x ``//`` alike:
    -1 // 86400000000 = 0 in both), so cross-engine parity holds for
    all us — but the day key is only calendar-correct for us ≥ 0
    (pre-epoch values would need floor division to land on the right
    day), and epoch'd market/event data is always non-negative."""
    return (
        f"CAST(DATE_ADD(DATE'1970-01-01',"
        f" CAST(({us}) DIV {_US_PER_DAY} AS INT)) AS STRING)"
    )


def sql_day_from_us_duckdb(us: str) -> str:
    """DuckDB twin of :func:`sql_day_from_us_spark` (``//`` floor-div,
    DATE + INTEGER day arithmetic, CAST DATE→VARCHAR is ISO
    'YYYY-MM-DD' in both engines)."""
    return (
        f"CAST((DATE '1970-01-01' +"
        f" CAST(({us}) // {_US_PER_DAY} AS INTEGER)) AS VARCHAR)"
    )


def sql_month_from_us_spark(us: str) -> str:
    """'YYYY-MM' month key from epoch micros (prefix of the day key)."""
    return f"SUBSTRING({sql_day_from_us_spark(us)}, 1, 7)"


def sql_month_from_us_duckdb(us: str) -> str:
    """DuckDB twin of :func:`sql_month_from_us_spark`."""
    return f"SUBSTRING({sql_day_from_us_duckdb(us)}, 1, 7)"


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
