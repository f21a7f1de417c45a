"""Round-8 pins: x96's shard-and-OR fallback, x102's CDF-constant
derivation, the reliable-checkpoint cleaner conf, and the q93/q94
ppm-overflow fix."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_llm import (
    _X102_THS,
    semantic_decontaminate,
)


def test_x96_shard_and_or_matches_single_broadcast(spark, sf_dir):
    """The shard-and-OR fallback (VERDICT r7 item 7) must be
    bit-identical to the single eval broadcast: max is associative
    over any partition of the eval set. Force ≥2 shards by capping the
    broadcast at 2 rows (eval slice is ~5 vectors at this SF)."""
    single = sorted(
        semantic_decontaminate(spark, sf_dir).collect(),
        key=lambda r: r["vec_id"],
    )
    sharded = sorted(
        semantic_decontaminate(spark, sf_dir, max_broadcast_rows=2).collect(),
        key=lambda r: r["vec_id"],
    )
    assert len(single) > 0
    assert [tuple(r) for r in sharded] == [tuple(r) for r in single]


def test_x96_shard_count_really_sharded(spark, sf_dir):
    """max_broadcast_rows=2 with a >2-row eval slice must actually
    split: the plan contains more than one broadcast exchange."""
    df = semantic_decontaminate(spark, sf_dir, max_broadcast_rows=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastExchange") >= 2


def test_x102_thresholds_derive_from_poisson1_cdf():
    """ADVICE r7: the x102 constants are ⌊CDF·2³²⌋ of Poisson(1) at
    n = 0..3 — derived here from math.exp(-1) so they cannot drift
    from the stated math."""
    e = math.exp(-1)
    cdf = 0.0
    derived = []
    for n in range(4):
        cdf += e / math.factorial(n)
        derived.append(math.floor(cdf * 2**32))
    assert tuple(derived) == _X102_THS


def test_session_cleans_reference_checkpoints(spark):
    """ADVICE r7: reliable=True checkpoints inside iterative loops
    accumulate up to max_iter corpus copies and outlive the job unless
    the ContextCleaner deletes them — the house session must pin the
    cleaner flag on."""
    assert (
        spark.conf.get("spark.cleaner.referenceTracking.cleanCheckpoints")
        == "true"
    )


def test_ppm_division_survives_bigint_overflow(spark):
    """q93/q94 regression (found by the sf10 A/B): 1e6 × a micro sum
    overflows BIGINT; the DECIMAL(38,0)-widened numerator must give
    the exact floor-div answer where the narrow form faults."""
    df = spark.createDataFrame(
        [(998877665544332211, 7776665554443332221)],
        "nation_mic bigint, total_mic bigint",
    )
    got = df.select(
        F.expr(
            "CAST((CAST(nation_mic AS DECIMAL(38,0)) * 1000000)"
            " div CAST(total_mic AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("ppm")
    ).collect()[0]["ppm"]
    assert got == (998877665544332211 * 1000000) // 7776665554443332221
