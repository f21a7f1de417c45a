"""Integer PageRank vs a pure-Python reference of the same recurrence."""

from __future__ import annotations

import random

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.graphrank import (
    BASE_US,
    DAMP_US,
    MICRO,
    pagerank_int,
)


def _reference(edges, iterations):
    sym = set()
    for a, b in edges:
        sym.add((a, b))
        sym.add((b, a))
    nodes = {u for u, _ in sym}
    deg = {u: sum(1 for x, _ in sym if x == u) for u in nodes}
    rank = {u: MICRO for u in nodes}
    for _ in range(iterations):
        incoming = {u: 0 for u in nodes}
        for u, v in sym:
            incoming[v] += rank[u] // deg[u]
        rank = {u: BASE_US + (DAMP_US * incoming[u]) // MICRO for u in nodes}
    return rank


def test_matches_reference_on_random_graph(spark):
    rng = random.Random(7)
    edges = list({(rng.randint(0, 40), rng.randint(0, 40)) for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]
    expect = _reference(edges, iterations=5)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_us"] for r in pagerank_int(df, iterations=5).collect()}
    assert got == expect


def test_hub_ranks_higher(spark):
    # star: node 0 linked to 1..10 — the hub must outrank the leaves
    edges = [(0, i) for i in range(1, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_us"] for r in pagerank_int(df, iterations=5).collect()}
    assert got[0] > max(got[i] for i in range(1, 11))
