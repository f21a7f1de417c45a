"""Reliable-checkpoint knob (operators/lineage.truncate_lineage).

The iterative operators truncate lineage each round; `reliable=True`
swaps the executor-local checkpoint for a durable one against the
session's checkpoint dir — the executor-loss-survivable tier for
corpus-scale intermediates (VERDICT r6 item 2). These tests pin:

1. the fail-fast contract when no checkpoint dir is configured;
2. result equality between the two tiers, end-to-end through the
   operators that plumb the knob (global_rank / deterministic_shuffle,
   connected components both variants, pagerank, BPE merge rounds,
   triangle_count);
3. that the reliable path really writes RDD checkpoint files into the
   configured directory (i.e. the knob changes the mechanism, not just
   a boolean).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.components import (
    connected_components,
    connected_components_star,
    triangle_count,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.graphrank import (
    pagerank_int,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.lineage import (
    truncate_lineage,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.shuffle import (
    deterministic_shuffle,
    global_rank,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.text import (
    bpe_merge_rounds,
)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def ckpt_dir(spark, tmp_path_factory):
    """Configure (and afterwards clear) a session checkpoint dir.

    The fail-fast test needs the dir UNSET, so it runs before this
    fixture is first requested (pytest instantiates fixtures lazily,
    but module order is not guaranteed — the fail-fast test therefore
    snapshots and restores instead of assuming).
    """
    d = str(tmp_path_factory.mktemp("reliable_ckpt"))
    spark.sparkContext.setCheckpointDir(d)
    yield d


def test_reliable_requires_checkpoint_dir(spark):
    sc = spark.sparkContext
    prev = sc._jsc.sc().getCheckpointDir()
    if not prev.isEmpty():
        pytest.skip("session already has a checkpoint dir")
    df = spark.range(5)
    with pytest.raises(ValueError, match="setCheckpointDir"):
        truncate_lineage(df, reliable=True)


def test_truncate_lineage_writes_to_checkpoint_dir(spark, ckpt_dir):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = truncate_lineage(df, reliable=True)
    assert _rows(out, "id", "v") == _rows(df, "id", "v")
    # the durable tier must have materialized blocks under the dir
    found = [
        os.path.join(root, f)
        for root, _, files in os.walk(ckpt_dir)
        for f in files
        if f.startswith("part-")
    ]
    assert found, f"no checkpoint part files under {ckpt_dir}"


def test_global_rank_and_shuffle_reliable_parity(spark, ckpt_dir):
    df = spark.range(500).withColumn(
        "key", F.md5(F.col("id").cast("string"))
    )
    base = _rows(global_rank(df, ["key"], "r"), "id", "r")
    rel = _rows(global_rank(df, ["key"], "r", reliable=True), "id", "r")
    assert base == rel
    s0 = _rows(deterministic_shuffle(df, "key", seed=7), "id", "shuffle_pos")
    s1 = _rows(
        deterministic_shuffle(df, "key", seed=7, reliable=True),
        "id",
        "shuffle_pos",
    )
    assert s0 == s1


def test_components_and_pagerank_reliable_parity(spark, ckpt_dir):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (7, 7), (3, 4)], ["src", "dst"]
    )
    for fn in (connected_components, connected_components_star):
        base = _rows(fn(edges), "node", "component_id")
        rel = _rows(fn(edges, reliable=True), "node", "component_id")
        assert base == rel, fn.__name__
    pr0 = _rows(pagerank_int(edges, iterations=3), "node", "rank_us")
    pr1 = _rows(
        pagerank_int(edges, iterations=3, reliable=True), "node", "rank_us"
    )
    assert pr0 == pr1
    tri_edges = edges.union(spark.createDataFrame([(1, 3)], ["src", "dst"]))
    t0 = triangle_count(tri_edges, "src", "dst")
    t1 = triangle_count(tri_edges, "src", "dst", reliable=True)
    assert t0.collect() == t1.collect()


def test_bpe_reliable_parity(spark, ckpt_dir):
    rows = [
        ("d1", i, t)
        for i, t in enumerate("l o w l o w e r n e w".split())
    ] + [("d2", i, t) for i, t in enumerate("n e w e s t l o w".split())]
    seq = spark.createDataFrame(rows, ["doc_id", "pos", "tok"])
    f0, w0 = bpe_merge_rounds(seq, 2)
    f1, w1 = bpe_merge_rounds(seq, 2, reliable=True)
    assert _rows(f0, "doc_id", "pos", "tok") == _rows(f1, "doc_id", "pos", "tok")
    for a, b in zip(w0, w1):
        assert a.collect() == b.collect()
