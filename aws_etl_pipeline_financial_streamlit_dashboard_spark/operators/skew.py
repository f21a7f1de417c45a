"""Skew-mitigation operators: salted aggregation and salted join.

The driver testdata has genuinely skewed keys (orders has only three
``o_orderstatus`` values across every row; at 100 TB a single hot key
lands an entire aggregation on one reducer). Two standing remedies:

- AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``,
  on in session.get_spark) handles *join* skew at runtime — but only
  for sort-merge joins it can observe.
- Salting handles *aggregation* skew and pre-AQE join skew
  structurally, and is the only remedy when the skewed side feeds a
  ``groupBy`` (AQE does not split aggregation partitions).

Both operators here are semantics-preserving (oracle-checked in the
catalog: q25); salting is a physical rewrite only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over skewed keys.

    Phase 1 groups by (keys, salt) — the hot key's rows spread over
    ``n_salts`` reducers; phase 2 re-aggregates the ≤ n_salts partial
    rows per key. The caller supplies both phases because the final
    combine depends on the aggregate (SUM→SUM, COUNT→SUM, MAX→MAX,
    AVG→SUM(sum)/SUM(count)):

        salted_aggregate(
            orders, ["o_orderstatus"],
            partial_aggs={"cnt": F.count("*"), "amt": F.sum("o_totalprice")},
            final_aggs={"n_orders": F.sum("cnt"), "total": F.sum("amt")},
        )

    Phase-1 shuffle carries ``|keys| × n_salts`` groups; phase-2 input
    is that many rows — negligible. Spark's own partial aggregation
    (map-side combine) already bounds *map* output; salting bounds the
    *reduce* side, which partial aggregation cannot when one key
    dominates.
    """
    salted = df.withColumn(_SALT, (F.rand(seed=42) * n_salts).cast("int"))
    phase1 = salted.groupBy(*keys, _SALT).agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in final_aggs.items()]
    )


def grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Skew-safe top-k rows per group: a salted partial top-k feeds the
    final per-group window, so no single reducer ever ranks a dominant
    group's full row set.

    A plain ``row_number() OVER (PARTITION BY group ORDER BY ...)``
    sends EVERY row of a group to one window partition — when one group
    dominates (one market segment with half the fact table), that is
    the aggregation-skew pathology AQE cannot split. Two phases, both
    exact:

    1. partial: rank within (group, salt) — salt = the row's scan
       partition id, a free deterministic spreader — and keep k rows
       per (group, salt). The exchange this window pays is hashed on
       (group, salt), so the hot group spreads over as many reducers
       as it had scan splits.
    2. final: rank within (group) over the pre-reduced survivors —
       ≤ k·|splits| rows per group instead of |group|.

    The global top-k of a group is always a subset of the union of its
    per-salt top-ks (any row beaten k times within its own salt bucket
    is beaten k times globally), so phase 2 sees every true winner:
    results are exactly the unsalted window's, independent of layout —
    PROVIDED ``order_by`` is a total order (add a unique-id tiebreak,
    as q13/q48 do; ties across salt buckets would otherwise make
    "which equal row survives" layout-dependent).

    Output = input columns + ``rank_col`` (1..k per group).
    """
    group_cols = list(group_cols)
    order_by = list(order_by)
    salted = df.withColumn(_SALT, F.spark_partition_id())
    pre_w = Window.partitionBy(*group_cols, _SALT).orderBy(*order_by)
    pre = (
        salted.withColumn("__prn", F.row_number().over(pre_w))
        .filter(F.col("__prn") <= k)
        .drop("__prn", _SALT)
    )
    final_w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return pre.withColumn(rank_col, F.row_number().over(final_w)).filter(
        F.col(rank_col) <= k
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the skewed side, replicate the small
    side ``n_salts``× (explode over the salt domain), join on
    (keys, salt).

    Use when the small side is too big to broadcast but the big side's
    key distribution is skewed and AQE can't help (e.g. the join feeds
    a co-partitioned downstream op). Replication multiplies the small
    side's shuffle volume by ``n_salts`` — keep it for genuinely
    moderate 'small' sides.

    Only ``inner`` and ``left`` are supported: the small side is
    replicated ``n_salts``×, so any join type that emits *unmatched
    small-side* rows (right/full outer) would emit each such row once
    per salt — n_salts duplicate null-extended rows. Rather than
    silently corrupting results, other join types raise.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner' or 'left', got {how!r}: "
            "the replicated small side would duplicate unmatched rows "
            f"{n_salts}x under right/full outer semantics"
        )
    on = list(on)
    salted = skewed.withColumn(_SALT, (F.rand(seed=42) * n_salts).cast("int"))
    replicated = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted.join(replicated, [*on, _SALT], how).drop(_SALT)
