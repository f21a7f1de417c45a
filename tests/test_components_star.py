"""Alternating large/small-star components vs union-find ground truth."""

from __future__ import annotations

import random

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.components import (
    connected_components,
    connected_components_star,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label every node with its component min
    labels = {}
    for n in parent:
        r = find(n)
        labels[n] = r
    # find() path-compresses to the min root because unions always
    # root at the smaller id
    return labels


def _spark_labels(spark, edges, fn):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = fn(df, src="src", dst="dst")
    return {r["node"]: r["component_id"] for r in out.collect()}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(1234)
    for _ in range(5):
        n = rng.randint(10, 120)
        m = rng.randint(5, 2 * n)
        edges = [
            (rng.randint(0, n), rng.randint(0, n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        expect = _union_find(edges)
        got = _spark_labels(spark, edges, connected_components_star)
        assert got == expect


def test_long_chain(spark):
    """A 200-node path — the adversarial diameter min-propagation
    needs 200 rounds for; the star algorithm resolves it within its
    default max_iter (O(log n) rounds)."""
    edges = [(i, i + 1) for i in range(200)]
    got = _spark_labels(spark, edges, connected_components_star)
    assert set(got.values()) == {0}
    assert len(got) == 201


def test_warns_when_rounds_exhausted_before_fixed_point(spark):
    """Exhausting max_iter without observing the fixed point must warn —
    silent truncation would hand back split components as if final."""
    import warnings

    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components_star(df, src="src", dst="dst", max_iter=1).collect()
    assert any(
        issubclass(w.category, RuntimeWarning)
        and "fixed point" in str(w.message)
        for w in caught
    )


def test_agrees_with_min_propagation(spark):
    rng = random.Random(99)
    edges = list(
        {
            (rng.randint(0, 60), rng.randint(0, 60))
            for _ in range(80)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    star = _spark_labels(spark, edges, connected_components_star)
    minprop = _spark_labels(spark, edges, connected_components)
    assert star == minprop
