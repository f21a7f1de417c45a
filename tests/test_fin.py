"""Unit fixtures for the financial tick-stream family (plans/catalog_fin)
and the hash-deterministic sampler — hand-built frames with known
answers, complementing the sf0.01 oracle-parity sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.sampling import (
    hash_stratified_sample,
)


def _ticks(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, us long, event_id long, value double"
    )


def test_ohlc_struct_extremes_tiebreak(spark):
    # Two ticks share the same timestamp; event_id must break the tie
    # for open (min) and close (max).
    df = _ticks(
        spark,
        [
            ("A", 100, 2, 5.0),
            ("A", 100, 1, 7.0),  # same us, lower id → the true open
            ("A", 200, 3, 3.0),
            ("A", 300, 5, 9.0),
            ("A", 300, 4, 1.0),  # same us, higher id (5) is the close
        ],
    )
    bar = (
        df.groupBy("event_type")
        .agg(
            F.min(F.struct("us", "event_id", "value")).getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.struct("us", "event_id", "value")).getField("value").alias("close"),
        )
        .collect()[0]
    )
    assert bar.open == 7.0
    assert bar.close == 9.0
    assert bar.high == 9.0
    assert bar.low == 1.0


def test_max_drawdown_running_peak(spark):
    # Path 10 → 8 → 12 → 6: peak path 10,10,12,12; worst drop 6/12 = 50%.
    df = _ticks(
        spark,
        [("A", 1, 1, 10.0), ("A", 2, 2, 8.0), ("A", 3, 3, 12.0), ("A", 4, 4, 6.0)],
    )
    dd = df.select(
        F.expr(
            "MAX(value) OVER (PARTITION BY event_type ORDER BY us, event_id"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ).alias("peak"),
        "value",
    )
    worst = dd.agg(F.max((F.col("peak") - F.col("value")) / F.col("peak"))).collect()[
        0
    ][0]
    assert worst == pytest.approx(0.5)


def test_ewma_constant_series_is_identity(spark):
    # EWMA of a constant series equals the constant at every row, for
    # any depth/weights (renormalized weights sum to 1).
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_fin import (
        _EWMA_DEN,
        _EWMA_NUM,
    )

    df = _ticks(spark, [("A", i, i, 42.25) for i in range(1, 15)])
    spec = "(PARTITION BY event_type ORDER BY us, event_id)"
    num = _EWMA_NUM.replace("OVER w", f"OVER {spec}")
    den = _EWMA_DEN.replace("OVER w", f"OVER {spec}")
    out = df.select(F.expr(f"({num}) / ({den})").alias("ewma")).collect()
    assert all(r.ewma == 42.25 for r in out)


def test_ewma_matches_python_reference(spark):
    # Depth-10 α=1/2 truncated EWMA vs the same recurrence in Python.
    vals = [10.0, 12.5, 11.0, 9.75, 14.0, 13.25, 8.5, 10.125]
    df = _ticks(spark, [("A", i, i, v) for i, v in enumerate(vals, start=1)])
    spec = "(PARTITION BY event_type ORDER BY us, event_id)"
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_fin import (
        _EWMA_DEN,
        _EWMA_NUM,
    )

    num = _EWMA_NUM.replace("OVER w", f"OVER {spec}")
    den = _EWMA_DEN.replace("OVER w", f"OVER {spec}")
    got = [
        r.ewma
        for r in df.select(
            "us", F.expr(f"({num}) / ({den})").alias("ewma")
        )
        .orderBy("us")
        .collect()
    ]
    for t in range(len(vals)):
        window = vals[max(0, t - 9) : t + 1][::-1]  # newest first
        n = sum(v * 0.5**i for i, v in enumerate(window))
        d = sum(0.5**i for i in range(len(window)))
        assert got[t] == pytest.approx(n / d, rel=1e-12)


def test_hash_stratified_sample_deterministic_and_on_target(spark, sf_dir):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import (
        read_table,
    )

    docs = read_table(spark, sf_dir, "documents")
    sources = [r.source for r in docs.select("source").distinct().collect()]
    fractions = {s: 0.5 for s in sources}
    a = hash_stratified_sample(docs, "source", "doc_id", fractions, seed=7)
    b = hash_stratified_sample(docs, "source", "doc_id", fractions, seed=7)
    ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
    assert ids_a == ids_b  # pure function of (key, seed)

    n_total = docs.count()
    # md5 is uniform: realized fraction within 5 sigma of 0.5
    import math

    sigma = math.sqrt(0.25 * n_total)
    assert abs(len(ids_a) - 0.5 * n_total) < 5 * sigma

    # a different seed draws a different (overlapping ~50%) subset
    c = hash_stratified_sample(docs, "source", "doc_id", fractions, seed=8)
    ids_c = sorted(r.doc_id for r in c.select("doc_id").collect())
    assert ids_a != ids_c

    # strata missing from the fraction map are dropped entirely
    only0 = hash_stratified_sample(docs, "source", "doc_id", {sources[0]: 1.0})
    assert only0.select("source").distinct().collect() == [(sources[0],)]


def test_knn_label_vote_tiebreak(spark):
    # 2 votes for label 3 and 2 votes for label 1 → smallest label wins.
    from pyspark.sql import Window

    votes = spark.createDataFrame(
        [(1, 3, 2), (1, 1, 2), (1, 5, 1)], "query_id long, label int, n_votes long"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label")
    )
    top = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()[0]
    )
    assert top.label == 1 and top.n_votes == 2


def test_returns_null_on_zero_or_first_tick(spark):
    df = _ticks(
        spark,
        [("A", 1, 1, 10.0), ("A", 2, 2, 0.0), ("A", 3, 3, 5.0), ("A", 4, 4, 10.0)],
    )
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_fin import (
        _RET_BP,
    )

    spec = "(PARTITION BY event_type ORDER BY us, event_id)"
    ret = _RET_BP.format(w=spec)
    rows = df.select("us", F.expr(ret).alias("r_bp")).orderBy("us").collect()
    assert rows[0].r_bp is None  # first tick has no prior
    assert rows[1].r_bp == -10000  # 10 → 0 is a −100% return
    assert rows[2].r_bp is None  # prior price 0 → undefined
    assert rows[3].r_bp == 10000  # 5 → 10 is +100%


def test_ntile_at_scale_matches_engine_ntile(spark):
    """ntile_at_scale's closed-form remainder rule must equal Spark's
    own NTILE for several (n, k) shapes, including n < k and n % k != 0."""
    from pyspark.sql import Window

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.shuffle import (
        ntile_at_scale,
    )

    for n, k in [(10, 4), (7, 3), (3, 5), (8, 8), (1, 2)]:
        df = spark.range(n).select(F.col("id").cast("long").alias("v"))
        ours = {
            (r.v, r.bucket)
            for r in ntile_at_scale(df, ["v"], k=k).collect()
        }
        theirs = {
            (r.v, r.b)
            for r in df.select(
                "v", F.ntile(k).over(Window.orderBy("v")).alias("b")
            ).collect()
        }
        assert ours == theirs, (n, k)
