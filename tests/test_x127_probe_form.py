"""x127's sorted-ring probe form (round 12 — the carried r10 PERF note
"the documented production form is a sorted-ring binary probe" made
real on the Spark side): the probe must be BIT-identical to the old
relational broadcast-cross + MIN form, and the Python-side md5 ring
positions must equal the SQL convention they replace."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_python_ring_positions_match_sql_convention(spark):
    """_x127_ring_literal computes positions in Python (hashlib md5
    prefix); they must equal _H_SPARK's conv(substring(md5,1,8),16,10)
    for every virtual node on both rings."""
    import hashlib

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_r10 import _H_SPARK

    rows = spark.sql(
        "SELECT shard, vslot, "
        + _H_SPARK.format(
            x="CONCAT('node-', CAST(shard AS STRING), '-',"
            " CAST(vslot AS STRING))"
        )
        + " AS pos FROM (SELECT explode(sequence(0, 8)) AS shard)"
        " CROSS JOIN (SELECT explode(sequence(0, 15)) AS vslot)"
    ).collect()
    for r in rows:
        py = int(
            hashlib.md5(f"node-{r['shard']}-{r['vslot']}".encode())
            .hexdigest()[:8],
            16,
        )
        assert py == r["pos"], (r["shard"], r["vslot"])


def test_probe_form_bit_identical_to_relational(spark, sf_dir):
    """The shipped probe entry vs the old relational form, full
    report, value-for-value."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_r10 import (
        _x127_relational,
        x127_consistent_hash_sharding,
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    probe = rows(x127_consistent_hash_sharding(spark, sf_dir))
    rel = rows(_x127_relational(spark, sf_dir))
    assert probe == rel and probe
