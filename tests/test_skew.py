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


def test_salted_join_left_rows_preserved(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = read_table(spark, sf_dir, "customer").select("c_custkey").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    out = salted_join(orders, customer, ["o_custkey"], n_salts=4, how="left")
    assert out.count() == orders.count()
