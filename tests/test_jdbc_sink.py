"""S8 JDBC overwrite sink — a REAL write + read-back against embedded
Derby (which ships in Spark's jars for the Hive metastore), exercising
the reference's entire load stage semantics (TableTransform.py:26-29,
``to_sql(..., if_exists="replace")``):

- the table is (re)created from the DataFrame schema,
- a second write fully replaces the first (idempotent overwrite),
- the write runs through the executor-side JDBC writer (num_partitions
  caps connections), not a driver-side row loop.

No external database needed: ``jdbc:derby:<dir>;create=true`` is an
in-process engine, the same single-node stand-in DuckDB plays for the
oracle side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.sinks import write_jdbc_overwrite

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db_dir};create=true"


def _company_frame(spark, rows):
    return spark.createDataFrame(
        rows, "ticker string, company_nm string, employees double"
    )


def test_jdbc_write_and_read_back(spark, derby_url):
    df = _company_frame(
        spark,
        [("AAPL", "Apple Inc.", 164000.0), ("MSFT", "Microsoft", 221000.0)],
    )
    write_jdbc_overwrite(
        df, derby_url, "company_info", properties={"driver": DRIVER}
    )
    back = spark.read.jdbc(derby_url, "company_info", properties={"driver": DRIVER})
    assert sorted(back.columns) == sorted(df.columns)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_jdbc_overwrite_replaces_not_appends(spark, derby_url):
    first = _company_frame(spark, [("AAPL", "Apple Inc.", 164000.0)])
    second = _company_frame(
        spark,
        [("GOOG", "Alphabet", 190000.0), ("AMZN", "Amazon", 1541000.0)],
    )
    props = {"driver": DRIVER}
    write_jdbc_overwrite(first, derby_url, "ratios", properties=props)
    write_jdbc_overwrite(second, derby_url, "ratios", properties=props)
    back = spark.read.jdbc(derby_url, "ratios", properties=props)
    # replace semantics: only the second load's rows survive
    assert {r["ticker"] for r in back.collect()} == {"GOOG", "AMZN"}


def test_jdbc_num_partitions_caps_connections(spark, derby_url):
    df = _company_frame(
        spark, [(f"T{i:03d}", f"Co {i}", float(i)) for i in range(100)]
    ).repartition(16)
    write_jdbc_overwrite(
        df,
        derby_url,
        "stock_price",
        properties={"driver": DRIVER},
        num_partitions=2,
    )
    back = spark.read.jdbc(derby_url, "stock_price", properties={"driver": DRIVER})
    assert back.count() == 100


def test_read_jdbc_round_trip_and_partitioned_scan(spark, derby_url):
    """S5 read direction: sources.readers.read_jdbc must round-trip
    what write_jdbc_overwrite stored, both as a single-connection read
    and as a partitioned parallel scan (the 100 TB shape: one range
    predicate per partition on a numeric column)."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_jdbc

    props = {"driver": DRIVER}
    df = _company_frame(
        spark, [(f"T{i:03d}", f"Co {i}", float(i)) for i in range(50)]
    )
    write_jdbc_overwrite(df, derby_url, "serve_ratios", properties=props)

    back = read_jdbc(spark, derby_url, "serve_ratios", properties=props)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}

    par = read_jdbc(
        spark,
        derby_url,
        "serve_ratios",
        properties=props,
        partition_column="employees",
        lower_bound=0,
        upper_bound=50,
        num_partitions=4,
    )
    assert par.rdd.getNumPartitions() == 4  # one range predicate each
    assert {tuple(r) for r in par.collect()} == {tuple(r) for r in df.collect()}
