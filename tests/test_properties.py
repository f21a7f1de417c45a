"""Property-based tests (hypothesis) — SURVEY.md §5.4.

Pure-function properties run at full hypothesis throughput; Spark
round-trips cap example counts (each example is a distributed job).
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.multimodal import (
    _fake_decode,
)


# ---------------------------------------------------------------------------
# round_half_up formula: floor(x·10ⁿ + 0.5)/10ⁿ must agree with decimal
# HALF_UP on the double's exact value wherever both are well-defined
# ---------------------------------------------------------------------------
@given(
    st.floats(min_value=0, max_value=1e6, allow_nan=False, allow_infinity=False),
    st.integers(min_value=0, max_value=6),
)
def test_round_half_up_formula_matches_decimal(x: float, n: int):
    scale = float(10**n)
    got = math.floor(x * scale + 0.5) / scale
    want = float(
        Decimal(x * scale).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    ) / scale
    # x·scale is itself a rounded double; the formula rounds THAT value —
    # compare against decimal HALF_UP of the same product
    assert got == want


@given(
    st.floats(min_value=0, max_value=1e6, allow_nan=False, allow_infinity=False),
    st.integers(min_value=0, max_value=6),
)
def test_round_half_up_negative_is_half_ceiling(x: float, n: int):
    """For negatives the formula rounds halves toward +∞ (floor-based);
    what matters for correctness is that BOTH engines use the identical
    formula — parity, not a particular tie convention. Pin the identity
    linking the two signs so a change to either side surfaces."""
    scale = float(10**n)

    def rhu(v: float) -> float:
        return math.floor(v * scale + 0.5) / scale

    prod = -x * scale
    if prod == math.floor(prod) + 0.5:  # exact half: +∞-ward
        assert rhu(-x) == (math.floor(prod) + 1) / scale
    else:
        assert rhu(-x) == -rhu(x) or abs(rhu(-x) + rhu(x)) <= 1.0 / scale


# ---------------------------------------------------------------------------
# fake media decode: output shape and scale invariants
# ---------------------------------------------------------------------------
@given(st.binary(min_size=0, max_size=512), st.integers(min_value=1, max_value=64))
def test_fake_decode_shape_and_bounds(payload: bytes, dim: int):
    feat = _fake_decode(payload, dim)
    assert len(feat) == dim
    # each accumulator ≤ len(payload)·1.0/max(len,1) ≤ 1.0
    assert all(0.0 <= v <= 1.0 for v in feat)
    # determinism
    assert feat == _fake_decode(payload, dim)


# ---------------------------------------------------------------------------
# as-of join vs pandas merge_asof on randomized inputs (ground truth)
# ---------------------------------------------------------------------------
_ts0 = dt.datetime(2024, 1, 1)

_sides = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.integers(min_value=0, max_value=1000),  # seconds offset
        st.integers(min_value=0, max_value=99),  # value
    ),
    min_size=0,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(left=_sides, right=_sides)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.asof import (
        asof_join,
    )

    # unique (key, ts) per side: both engines' tie semantics for exact
    # duplicates are unspecified, which is not the property under test
    left = list({(k, s): (k, s, v) for k, s, v in left}.values())
    right = list({(k, s): (k, s, v) for k, s, v in right}.values())

    lpdf = pd.DataFrame(
        [(i, k, _ts0 + dt.timedelta(seconds=s), float(v)) for i, (k, s, v) in enumerate(left)],
        columns=["lid", "k", "ts", "lv"],
    )
    rpdf = pd.DataFrame(
        [(k, _ts0 + dt.timedelta(seconds=s), float(v)) for k, s, v in right],
        columns=["k", "ts", "rv"],
    )

    if not len(lpdf):
        return
    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf, schema="k long, ts timestamp, rv double")
    got = {
        r["lid"]: r["rv"]
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="ts", value_cols=["rv"]
        ).collect()
    }

    if len(rpdf):
        expected_df = pd.merge_asof(
            lpdf.sort_values("ts", kind="stable"),
            rpdf.sort_values("ts", kind="stable"),
            on="ts",
            by="k",
            direction="backward",  # latest right with r.ts <= l.ts
        )
        expected = dict(zip(expected_df["lid"], expected_df["rv"]))
    else:
        expected = {i: float("nan") for i in lpdf["lid"]}

    assert set(got) == set(expected)
    for lid, rv in expected.items():
        g = got[lid]
        assert (g is None and (rv is None or pd.isna(rv))) or g == rv


# ---------------------------------------------------------------------------
# Fixed-point aggregate parity: dec_sum/stable_avg (Spark) must be
# BITWISE equal to their sql_* twins (DuckDB) on arbitrary doubles —
# the core cross-engine determinism trick the whole catalog leans on.
# ---------------------------------------------------------------------------
@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e9,
            max_value=1e9,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=40,
    )
)
def test_dec_sum_stable_avg_match_duckdb(spark, values):
    import duckdb

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.functions.scalars import (
        dec_sum,
        sql_dec_sum,
        sql_stable_avg,
        stable_avg,
    )

    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = df.agg(
        dec_sum("v", 2).alias("s"), stable_avg("v", 6).alias("a")
    ).first()

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES {}) AS t(v)".format(
        ", ".join(f"(CAST({v!r} AS DOUBLE))" for v in values)
    ))
    want = con.sql(
        f"SELECT {sql_dec_sum('v', 2)} AS s, {sql_stable_avg('v', 6)} AS a FROM t"
    ).fetchone()

    assert got["s"] == want[0], (values, got["s"], want[0])
    assert got["a"] == want[1], (values, got["a"], want[1])
