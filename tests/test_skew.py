"""Skew operators are physical rewrites only: results must be
identical to the plain groupBy / join they replace."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_aggregate_matches_plain(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    plain = orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.max("o_totalprice").alias("mx")
    )
    salted = salted_aggregate(
        orders,
        ["o_orderstatus"],
        partial_aggs={"cnt": F.count("*"), "m": F.max("o_totalprice")},
        final_aggs={"n": F.sum("cnt"), "mx": F.max("m")},
    )
    assert _rows(salted) == _rows(plain)


def test_salted_join_matches_plain(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cust = customer.withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(cust, "o_custkey", "inner")
    salted = salted_join(orders, cust, ["o_custkey"], n_salts=4)
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_grouped_topk_matches_plain_window(spark, sf_dir):
    from pyspark.sql import Window

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.skew import grouped_topk

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    order_by = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    w = Window.partitionBy("o_orderstatus").orderBy(*order_by)
    plain = (
        orders.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)
    )
    salted = grouped_topk(orders, ["o_orderstatus"], order_by, k=5)
    assert _rows(salted.select(*plain.columns)) == _rows(plain)
    # layout independence: a different split count, same winners
    salted7 = grouped_topk(orders.repartition(7), ["o_orderstatus"], order_by, k=5)
    assert _rows(salted7.select(*plain.columns)) == _rows(plain)


def test_grouped_topk_final_window_input_is_prereduced(spark, sf_dir):
    """The plan must show TWO window nodes with the partial-rank filter
    between them: the final per-group window ranks only per-salt
    survivors, never the full group."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.skew import grouped_topk

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).repartition(6)
    out = grouped_topk(
        orders,
        ["o_orderstatus"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=5,
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2
    assert "__prn" in plan  # partial rank exists and is filtered
    # the partial filter must sit below the final window: the last
    # Window block in the plan string is the FINAL one, and the __prn
    # filter appears after (deeper than) it in the tree printout
    final_window_at = plan.index("Window")
    assert "__prn" in plan[final_window_at:]


def test_salted_join_left_rows_preserved(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = read_table(spark, sf_dir, "customer").select("c_custkey").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    out = salted_join(orders, customer, ["o_custkey"], n_salts=4, how="left")
    assert out.count() == orders.count()
