"""hot_neighbor_cap in link_prediction_ra (VERDICT r10 item 2): the
cap must bound the candidate pairs a high-degree hub generates without
inventing pairs or changing a survivor's score when the cap is inert —
same escape-hatch contract as x02's hot_shingle_cap and x48's
hot_block_cap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.graphrank import (
    link_prediction_ra,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "a string, b string"
    ).distinct()


def _rows(df):
    return {
        (r["host_a"], r["host_b"]): (
            r["n_common"], r["ra_ppm"], r["jaccard_ppm"]
        )
        for r in df.collect()
    }


def _hub_graph(spark, spokes=12):
    # one hub linked to every spoke, plus a small honest clique among
    # the first three spokes so non-hub common neighbors exist
    pairs = [("hub", f"s{i:02d}") for i in range(spokes)]
    pairs += [("s00", "s01"), ("s01", "s02")]
    return _edges(spark, pairs)


def test_generous_cap_is_exact(spark):
    und = _hub_graph(spark)
    uncapped = _rows(link_prediction_ra(und, k=100))
    capped = _rows(link_prediction_ra(und, k=100, hot_neighbor_cap=1000))
    assert capped == uncapped
    assert uncapped, "empty prediction set — graph no longer exercises RA"


def test_tiny_cap_prunes_but_never_invents(spark):
    und = _hub_graph(spark)
    uncapped = _rows(link_prediction_ra(und, k=100))
    capped = _rows(link_prediction_ra(und, k=100, hot_neighbor_cap=3))
    # capping can only LOSE candidates (pairs supported solely by hub
    # neighbors), never invent them
    assert set(capped) <= set(uncapped)
    assert len(capped) < len(uncapped), "cap=3 should exclude the hub"
    # a survivor's RA/Jaccard may only shrink (hub contributions
    # dropped), never grow
    for pair, (n_c, ra, jac) in capped.items():
        un_c, un_ra, un_jac = uncapped[pair]
        assert n_c <= un_c and ra <= un_ra and jac <= un_jac


def test_cap_bounds_synthetic_hub_candidates(spark):
    """The actual scale property: a degree-H hub generates H·(H−1)/2
    candidate pairs uncapped; with the hub excluded from the
    shared-neighbor role those pairs vanish unless another neighbor
    supports them."""
    spokes = 14
    und = _hub_graph(spark, spokes=spokes)
    uncapped = _rows(link_prediction_ra(und, k=1000))
    # every spoke pair is a candidate through the hub
    spoke_pairs = [p for p in uncapped if not ("hub" in p[0] or "hub" in p[1])]
    assert len(spoke_pairs) >= spokes * (spokes - 1) // 2 - 2  # minus clique edges
    capped = _rows(link_prediction_ra(und, k=1000, hot_neighbor_cap=3))
    # only pairs certified by a low-degree common neighbor survive:
    # s00-s02 via s01 (degree 3 ≤ cap); everything hub-only is gone
    surviving_spoke_pairs = [
        p for p in capped if not ("hub" in p[0] or "hub" in p[1])
    ]
    assert ("s00", "s02") in capped
    assert len(surviving_spoke_pairs) <= 3


def test_audit_cap_drops_warns_when_hub_dropped(spark, caplog):
    """ADVICE r11: the opt-in audit must WARN (with the dropped count)
    when the cap actually excludes a shared-neighbor vertex, and stay
    below WARNING when the cap is inert — the runtime tripwire for
    data that grows a hub past the probed degree."""
    import logging

    und = _hub_graph(spark)  # hub degree 12 > cap 3
    with caplog.at_level(
        logging.DEBUG,
        logger="aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.graphrank",
    ):
        link_prediction_ra(und, k=5, hot_neighbor_cap=3, audit_cap_drops=True)
    warns = [r for r in caplog.records if r.levelno >= logging.WARNING]
    assert warns and "drops 1 " in warns[0].getMessage()
    assert "max degree 12" in warns[0].getMessage()

    caplog.clear()
    with caplog.at_level(
        logging.DEBUG,
        logger="aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.graphrank",
    ):
        link_prediction_ra(
            und, k=5, hot_neighbor_cap=1000, audit_cap_drops=True
        )
    assert not [r for r in caplog.records if r.levelno >= logging.WARNING]
    assert any("inert" in r.getMessage() for r in caplog.records)
