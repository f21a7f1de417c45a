"""Broadcast-hint policy regression net (round-8, VERDICT r7 item 1).

The rule (docs/SCALE.md): broadcast hints are legitimate only on
frames bounded by construction; linearly-scaling tables (customer,
supplier, part, facts) leave the decision to
autoBroadcastJoinThreshold + AQE — a hardcoded hint is the textbook
100× OOM (the hint overrides the threshold, so "it's small today"
becomes "the full dim is the build side forever").

Pins:
- the TPC-H decision-support batch (the round-7 offenders q85-q90 plus
  the same-pattern q63/q84 and q95) carries ZERO unconditional
  broadcast hints over customer/supplier/part/fact scans;
- where dropping the hint measurably regressed at sf10 (q92 +98%,
  q93 +211%, q94 +27% — docs/PERF.md round-8), the hint is retained
  behind the maybe_broadcast_dim size guard instead: present while
  the base dim fits the threshold, gone when the threshold says no;
- q16/q34's BROADCAST(cr) is emitted ONLY under the same
  dim_fits_broadcast size guard: present while customer fits the
  threshold (every bench scale), gone when the threshold says no.
"""

from __future__ import annotations

import pytest

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import (
    QUERIES,
    dim_fits_broadcast,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.plan_audit import (
    unbounded_broadcast_hints,
)

# every batch entry that joins a linearly-scaling dim in the TPC-H
# decision-support catalog — the surface where the round-7 violations
# lived; new entries in this family must be added here
_PINNED = [
    "q63_data_quality_report",
    "q84_disjunctive_promo_revenue",
    "q85_top_revenue_supplier",
    "q86_sole_late_supplier",
    "q87_large_volume_orders",
    "q88_small_lot_revenue",
    "q89_shipping_priority",
    "q90_returned_item_report",
    "q91_forecast_revenue_change",
    "q95_top_customer_listagg",
]

# entries whose linear-dim hint is retained behind the
# maybe_broadcast_dim / dim_fits_broadcast size guard (measured
# regressions without it — docs/PERF.md round-8): expected count of
# guarded hint sites at the default threshold, zero when the guard
# is forced off
_GUARDED = {
    "q16_star_join_revenue": 1,   # BROADCAST(cr) — customer fold
    "q34_star_join_bucketed": 1,  # BROADCAST(cr) — customer fold
    "q92_two_nation_volume": 2,   # cmap (customer) + smap (supplier)
    "q93_market_share": 2,        # cust_in_r (customer) + smap (supplier)
    "q94_promo_revenue_share": 1, # part
    "q96_product_type_profit": 1, # smap (supplier); part stays un-hinted
    "q97_important_stock": 4,     # part + supplier, ×2 grand-total fork
    "q98_specialized_suppliers": 1,  # part
    "q99_supplier_part_counts": 1,  # part (size IN-list slice)
}


@pytest.mark.parametrize("name", _PINNED)
def test_no_unconditional_linear_dim_broadcast(spark, sf_dir, name):
    df = QUERIES[name].spark(spark, sf_dir)
    flags = unbounded_broadcast_hints(df)
    assert flags == [], f"{name} hardcodes broadcast on a linear frame: {flags}"


@pytest.mark.parametrize("name,n_guarded", sorted(_GUARDED.items()))
def test_linear_dim_hints_are_size_guarded(spark, sf_dir, name, n_guarded):
    """Guarded hints: present while the base dim fits the threshold,
    absent when it can't — the guard, not the hint, is the contract."""
    assert dim_fits_broadcast(spark, sf_dir, "customer")
    df = QUERIES[name].spark(spark, sf_dir)
    assert len(unbounded_broadcast_hints(df)) == n_guarded

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert not dim_fits_broadcast(spark, sf_dir, "customer")
        df2 = QUERIES[name].spark(spark, sf_dir)
        assert unbounded_broadcast_hints(df2) == []
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q95_routes_through_grouped_topk(spark, sf_dir):
    """q95's per-segment top-5 must be the two-phase salted top-k
    (grouped_topk), never one window partition per segment: the salt
    column's partial rank is visible as a second row_number window in
    the optimized plan (two Window nodes), and results must equal the
    plain-window oracle (pinned by the driver's hash check)."""
    df = QUERIES["q95_top_customer_listagg"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # two-phase: partial (segment, salt) window + final (segment) window
    assert plan.count("Window [") == 2
    assert "SPARK_PARTITION_ID" in plan.upper()


def test_markerless_checkpointed_frame_defaults_linear(spark, sf_dir):
    """ADVICE r9 regression net: a broadcast hint on a checkpointed
    frame whose key columns were RENAMED (so no attribute marker can
    name the source table) must still flag — as LogicalRDD:unknown —
    under the uniform DEFAULT-LINEAR rule. The old fallback returned
    'bounded' for exactly this shape."""
    import pyspark.sql.functions as F

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import (
        read_table,
    )

    renamed = (
        read_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("k"), F.col("source").alias("s"))
        .localCheckpoint(eager=True)
    )
    fact = read_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("k"), "n_chars"
    )
    df = fact.join(F.broadcast(renamed), "k")
    flags = unbounded_broadcast_hints(df)
    assert flags, "renamed-key checkpointed broadcast passed as bounded"
    assert any("LogicalRDD:unknown" in f for f in flags), flags
