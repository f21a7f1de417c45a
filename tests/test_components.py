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


def test_triangle_count_known_graph(spark):
    """K4 plus a pendant edge: K4 has exactly 4 triangles; the pendant
    adds none. Degree ordering must count each exactly once."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.components import (
        triangle_count,
    )

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    edges = spark.createDataFrame(k4, "a long, b long")
    row = triangle_count(edges).collect()[0]
    assert row.n_triangles == 4
    assert row.n_edges == 7
    assert row.n_vertices == 5


def test_triangle_count_hub_wedges_bounded(spark):
    """A star (hub + 40 leaves) has zero triangles AND — the scale
    property — zero oriented wedges at the hub: all its edges orient
    leaf→hub (leaves have lower degree), so no wedge pivots on it.
    A naive enumeration would generate C(40,2)=780 hub wedges."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.components import (
        triangle_count,
    )

    star = [(0, i) for i in range(1, 41)]
    edges = spark.createDataFrame(star, "a long, b long")
    row = triangle_count(edges).collect()[0]
    assert row.n_triangles == 0
    assert row.n_wedges == 0
