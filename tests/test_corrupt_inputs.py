"""Scan-level fault tolerance — B2's continue-on-failure at the read
path (SURVEY.md §2.10: the reference tolerates partial results per
batch, `retrieval.py:140-151`). At 100 TB a single corrupt object must
degrade the read, not kill the 6-hour job:

1. ``spark.sql.files.ignoreCorruptFiles``: a table directory with one
   truncated/garbage parquet part fails the whole scan by default
   (fail-fast is the right default — silent data loss is worse), and
   reads every healthy part when the flag is on.
2. CSV PERMISSIVE mode with ``columnNameOfCorruptRecord``: malformed
   rows are quarantined into a column instead of failing the load —
   the S2 seed-scan hardening.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def mixed_parquet_dir(spark, tmp_path):
    d = str(tmp_path / "tbl")
    spark.range(100).withColumn("v", F.col("id") * 2).coalesce(2).write.parquet(d)
    with open(os.path.join(d, "part-corrupt.parquet"), "wb") as fh:
        fh.write(b"PAR1 this is not a real parquet footer")
    return d


def test_corrupt_part_fails_fast_by_default(spark, mixed_parquet_dir):
    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    try:
        with pytest.raises(Exception):
            spark.read.parquet(mixed_parquet_dir).count()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)


def test_ignore_corrupt_files_reads_healthy_parts(spark, mixed_parquet_dir):
    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        df = spark.read.parquet(mixed_parquet_dir)
        assert df.count() == 100
        assert df.agg(F.sum("v")).collect()[0][0] == sum(2 * i for i in range(100))
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)


def test_csv_permissive_quarantines_malformed_rows(spark, tmp_path):
    p = str(tmp_path / "seed.csv")
    with open(p, "w") as fh:
        fh.write("ticker_name,weight\n")
        fh.write("AAPL,1.5\n")
        fh.write("MSFT,not_a_number\n")  # malformed numeric
        fh.write("GOOG,2.5\n")
    df = (
        spark.read.schema(
            "ticker_name string, weight double, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", "true")
        .csv(p)
    ).cache()  # required: corrupt-record column + filter needs the full row
    try:
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert sorted(r["ticker_name"] for r in good.collect()) == [
            "AAPL",
            "GOOG",
        ]
        assert bad.count() == 1
        assert "not_a_number" in bad.collect()[0]["_corrupt_record"]
    finally:
        df.unpersist()
