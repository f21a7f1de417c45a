"""AQE skew-join engagement — proving the mitigation, not just the conf.

session.py enables ``spark.sql.adaptive.skewJoin`` for cluster runs and
SCALE.md leans on it as the runtime tier of the skew strategy (below
the explicit salting of operators/skew.py). These tests PROVE the
mechanism and pin its one important non-obvious boundary:

1. A sort-merge join whose left side is one hot key re-plans at
   runtime with the skewed partition SPLIT (``skew=true`` on the SMJ
   node of the AQE final plan) and returns the same rows as AQE-off.
2. When the join feeds an aggregation ON THE JOIN KEY, AQE *refuses*
   the split (splitting would break the output partitioning the
   aggregate wants to reuse) — exactly the case where the explicit
   salting operator (q25/q42) remains necessary. Pinning the refusal
   keeps SCALE.md's "AQE below salting" hierarchy an observed fact.

Thresholds are lowered so the toy build exhibits "skew" at MB scale;
per the house gotcha, collect() first (AQE finalizes per execution),
then read the final plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.shuffle.partitions": "8",
}


def _skewed_frames(spark):
    # left: 200k rows of key 0 (hot) + 8k spread over keys 1..7
    left = spark.range(208_000).select(
        F.when(F.col("id") < 200_000, F.lit(0))
        .otherwise((F.col("id") % 7) + 1)
        .alias("k"),
        F.concat(F.lit("payload_"), F.col("id")).alias("pay"),
    )
    right = spark.range(8).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    return left, right


def _with_confs(spark, fn):
    prev = {c: spark.conf.get(c, None) for c in _CONFS}
    try:
        for c, v in _CONFS.items():
            spark.conf.set(c, v)
        return fn()
    finally:
        for c, v in prev.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)


def test_aqe_splits_skewed_join_partition(spark):
    def run():
        left, right = _skewed_frames(spark)
        # global aggregate: no required output distribution on the join
        # key, so the skewed partition is splittable. The payload MUST
        # survive column pruning into the shuffle (sum of its length) —
        # 200k identical pruned keys COMPRESS below any skew threshold
        # (MapStatus sizes are compressed bytes), and a skew the shuffle
        # can't see is a skew AQE won't split.
        j = left.join(right.hint("merge"), "k").groupBy().agg(
            F.count("*").alias("n"), F.sum(F.length("pay")).alias("lp")
        )
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:3000]

        spark.conf.set("spark.sql.adaptive.enabled", "false")
        left2, right2 = _skewed_frames(spark)
        j2 = left2.join(right2.hint("merge"), "k").groupBy().agg(
            F.count("*").alias("n"), F.sum(F.length("pay")).alias("lp")
        )
        assert j2.collect() == rows
        assert rows[0]["n"] == 208_000

    _with_confs(spark, run)


def test_aqe_refuses_split_when_join_key_agg_follows(spark):
    """The boundary that keeps explicit salting necessary: aggregation
    on the join key reuses the join's hash partitioning, so AQE must
    NOT split the skewed partition (it would have to re-shuffle what
    it just split — checked as the absence of skew=true)."""

    def run():
        left, right = _skewed_frames(spark)
        j = (
            left.join(right.hint("merge"), "k")
            .groupBy("k")
            .agg(F.count("*").alias("n"))
        )
        rows = sorted(tuple(r) for r in j.collect())
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" not in plan
        assert rows[0] == (0, 200_000)

    _with_confs(spark, run)
