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


def test_zorder_key_interleaves_bits(spark):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.maintenance import (
        zorder_key,
    )

    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    z = df.select(zorder_key(["a", "b"], bits=3).alias("z")).collect()[0].z
    # a bits go to even positions, b bits to odd:
    # a=101 → 1<<0, 0<<2, 1<<4 ; b=011 → 1<<1, 1<<3, 0<<5 → 0b011011
    assert z == 0b011011


def test_zorder_tightens_both_columns(spark, sf_dir, tmp_path):
    """Per-file spans on BOTH z-ordered columns must shrink vs the
    unclustered layout — the parquet-stats skipping proxy."""
    import pyarrow.parquet as pq

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.maintenance import (
        cluster_by_zorder,
    )
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import (
        read_table,
    )

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out = str(tmp_path / "zorders")
    cluster_by_zorder(orders, out, ["o_custkey", "o_totalprice"], n_files=8)

    spans = {"o_custkey": [], "o_totalprice": []}
    import os

    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) >= 4
    for f in files:
        meta = pq.ParquetFile(os.path.join(out, f)).metadata
        schema_names = [meta.schema.column(i).name for i in range(meta.num_columns)]
        for rg in range(meta.num_row_groups):
            for col in spans:
                st = meta.row_group(rg).column(schema_names.index(col)).statistics
                spans[col].append(st.max - st.min)

    full = {
        "o_custkey": orders.agg(
            F.max("o_custkey") - F.min("o_custkey")
        ).collect()[0][0],
        "o_totalprice": orders.agg(
            F.max("o_totalprice") - F.min("o_totalprice")
        ).collect()[0][0],
    }
    for col in spans:
        avg_span = sum(spans[col]) / len(spans[col])
        # With 8 z-ordered files over 2 columns each file covers
        # ~1/sqrt(8) of each domain; assert a conservative 2/3.
        assert avg_span < full[col] * 0.67, (col, avg_span, full[col])

    # correctness: the rewrite is a permutation of the input
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    assert back.agg(F.sum("o_orderkey")).collect()[0][0] == orders.agg(
        F.sum("o_orderkey")
    ).collect()[0][0]
