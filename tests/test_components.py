"""Connected components: transitivity across chains (the case pairwise
dedup misses), multiple components, and label minimality."""

from __future__ import annotations

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.components import (
    connected_components,
)


def test_chain_transitivity_and_multiple_components(spark):
    # 1-2-3-4 chain (1≈2, 2≈3, 3≈4: 1 and 4 never compared directly),
    # separate 10-11 pair, isolated 99 not in edges at all
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    got = {
        r["node"]: r["component_id"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    """A 12-node path needs multiple propagation rounds — must still
    converge to a single min label."""
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = {
        r["node"]: r["component_id"] for r in connected_components(edges).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_fixed_rounds_mode_matches_probed(spark):
    """probe_convergence=False runs a scheduled round count with zero
    per-round driver actions and must produce identical labels once
    max_iter covers the diameter."""
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)] + [(i, i + 1) for i in range(20, 31)],
        "src long, dst long",
    )
    probed = {
        r["node"]: r["component_id"] for r in connected_components(edges).collect()
    }
    fixed = {
        r["node"]: r["component_id"]
        for r in connected_components(
            edges, max_iter=12, probe_convergence=False
        ).collect()
    }
    assert fixed == probed
