"""Schema evolution on the lake: a sink that gains a column keeps
serving old and new files together (mergeSchema read), with NULL
backfill for pre-evolution rows — the append-only schema-change
contract an incremental pipeline needs (the reference sidesteps it by
rewriting whole tables; an incremental engine cannot)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table


def test_merge_schema_reads_evolved_sink(spark, sf_dir, tmp_path):
    out = str(tmp_path / "serving")
    orders = read_table(spark, sf_dir, "orders")

    # v1 writer: original columns
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    v1.write.mode("append").parquet(out)

    # v2 writer: adds a derived column (schema evolves in place)
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.expr("o_totalprice * 0.1").alias("fee_estimate"),
    )
    v2.write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "fee_estimate",
    }
    assert merged.count() == orders.count()
    # pre-evolution rows read the new column as NULL; new rows keep it
    nulls = merged.filter(F.col("fee_estimate").isNull()).count()
    assert nulls == v1.count()
    # and a plain read (no mergeSchema) still works for consumers
    # pinned to one footer's schema — no write-time rewrite happened
    assert spark.read.parquet(out).count() == orders.count()
