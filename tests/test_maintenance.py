"""Compaction reduces file count without changing data; range
clustering produces disjoint per-file key ranges (data-skipping)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.maintenance import (
    cluster_by_range,
    compact_parquet,
    plan_compaction,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table


def _parquet_files(path):
    return [
        os.path.join(r, n)
        for r, _d, ns in os.walk(path)
        for n in ns
        if n.endswith(".parquet")
    ]


def test_compaction_preserves_data_and_cuts_files(spark, sf_dir, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    orders = read_table(spark, sf_dir, "orders")
    orders.repartition(40).write.parquet(src)  # fragment: 40 small files
    assert plan_compaction(src)["n_files"] == 40

    stats = compact_parquet(spark, src, dst)
    assert stats["target_files"] == 1  # tiny data → one file
    assert len(_parquet_files(dst)) == 1
    assert spark.read.parquet(dst).count() == orders.count()
    a = sorted(map(tuple, spark.read.parquet(dst).collect()))
    b = sorted(map(tuple, orders.collect()))
    assert a == b


def test_range_clustering_gives_disjoint_file_ranges(spark, sf_dir, tmp_path):
    out = str(tmp_path / "clustered")
    orders = read_table(spark, sf_dir, "orders")
    cluster_by_range(orders, out, ["o_orderkey"], n_files=4)

    ranges = []
    for f in _parquet_files(out):
        md = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(len(md.schema))
            if md.schema.column(i).name == "o_orderkey"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) == 4
    # disjoint: each file's min exceeds the previous file's max
    for (_, prev_max), (cur_min, _) in zip(ranges, ranges[1:]):
        assert cur_min > prev_max
