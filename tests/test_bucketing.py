"""Bucketed co-located join: the write-once shuffle must buy a
zero-exchange join plan, with results identical to the plain join."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.bucketing import (
    drop_table,
    write_bucketed,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="bucketing_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmpdir):
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(
        orders, "orders_b", 8, ["o_orderkey"], path=os.path.join(tmpdir, "o")
    )
    write_bucketed(
        lineitem, "lineitem_b", 8, ["l_orderkey"], path=os.path.join(tmpdir, "l")
    )
    try:
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        # force the non-broadcast path: broadcasting would hide the
        # exchange this test exists to rule out
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
            joined.collect()
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # the whole point: co-located scan, ZERO exchanges
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan
            assert "SelectedBucketsCount: 8 out of 8" in plan
            # (a per-task Sort remains: since SPARK-28632 Spark ignores
            # bucket sortBy metadata at scan time by default — sorting
            # 1/n_buckets of the data per task, no shuffle)

            plain = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            assert joined.count() == plain.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        drop_table(spark, "orders_b")
        drop_table(spark, "lineitem_b")


def test_q73_flagship_bucketed_plan_shape(spark, sf_dir):
    """q73's promise is structural: over custkey-bucketed orders +
    customer, the per-customer rollup group-by and the
    customer⋈rollup join are BOTH exchange-free — the executed plan
    carries exactly two exchanges (the nation dim broadcast and the
    25-row final aggregate), and no exchange sits below the join."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import (
        QUERIES,
    )

    df = QUERIES["q73_flagship_bucketed"].spark(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE prints '== Final Plan ==' followed by '== Initial Plan ==';
    # count nodes in the final section only
    plan = plan.split("== Initial Plan ==")[0]
    n_broadcast = plan.count("BroadcastExchange")
    n_shuffle = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    assert n_broadcast == 1, plan
    assert n_shuffle == 1, plan
