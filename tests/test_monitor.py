"""Observation-based quality monitors: metrics ride the existing
action (no extra job) and thresholds evaluate correctly."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.monitor import (
    quality_report,
    with_quality_metrics,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table


def test_metrics_ride_the_action(spark, sf_dir):
    cust = read_table(spark, sf_dir, "customer")
    df, obs = with_quality_metrics(
        cust, "cust_load", null_cols=["c_name"], bounds={"c_acctbal": (0, 1e9)}
    )
    n = df.count()  # the one action; metrics computed alongside
    rep = quality_report(obs, rows_min=1, max_null_fraction=0.0)
    assert rep["metrics"]["n_rows"] == n
    assert rep["metrics"]["nulls__c_name"] == 0
    # acctbal can be negative in TPC-H-ish data → bound violation fires
    rep2 = quality_report(obs, bounds={"c_acctbal": (0, 1e9)})
    has_neg = cust.filter(F.col("c_acctbal") < 0).count() > 0
    assert (len(rep2["violations"]) > 0) == has_neg


def test_empty_input_flags_rows_min(spark, sf_dir):
    cust = read_table(spark, sf_dir, "customer").filter(F.lit(False))
    df, obs = with_quality_metrics(cust, "empty_load")
    df.count()
    rep = quality_report(obs, rows_min=1)
    assert rep["violations"] == ["n_rows=0 < 1"]
