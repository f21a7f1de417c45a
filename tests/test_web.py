"""Web-crawl curation family (x65-x67): canonicalization rules,
plan shape, and budget-sampling invariants (VERDICT r4 item 6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.web import (
    sql_canon_parts,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import QUERIES
from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_web import (
    _BUDGET,
)


# Rule-level cases: each exercises one canonicalization contract line
# (operators/web.py docstring).
_CASES = [
    # lowercase scheme+host, strip default https port, strip fragment,
    # strip leading utm_ param
    (
        "HTTPS://WWW.Foo.Example.COM:443/docs/1/item?utm_source=x&id=5#frag",
        "https://www.foo.example.com/docs/1/item?id=5",
    ),
    # default http port stripped; non-tracking params keep their order
    (
        "HTTP://a.b:80/p?b=2&a=1",
        "http://a.b/p?b=2&a=1",
    ),
    # non-default port kept
    ("http://a.b:8080/p", "http://a.b:8080/p"),
    # all params tracking -> no '?' at all
    ("http://a.b/p?utm_campaign=z&gclid=1", "http://a.b/p"),
    # tracking param in the middle
    ("http://a.b/p?id=1&fbclid=xx&q=2", "http://a.b/p?id=1&q=2"),
    # no query, no port, already canonical
    ("https://a.b/p", "https://a.b/p"),
    # pre-existing malformed '&&' runs normalize to single separators
    # (crawled query strings contain them; the tracking-strip itself
    # never produces doubles — this is input repair, not cleanup of
    # our own removal)
    ("http://a.b/p?x=1&&y=2&&&z=3", "http://a.b/p?x=1&y=2&z=3"),
]


@pytest.mark.parametrize("raw,want", _CASES)
def test_canonicalization_rules(spark, raw, want):
    url_sql = sql_canon_parts(f"'{raw}'", "spark")["url"]
    got = spark.sql(f"SELECT {url_sql} AS u").collect()[0].u
    assert got == want


def test_canonicalize_plan_has_no_shuffle(spark, sf_dir):
    """x65 is a narrow projection chain: canonicalization must not
    exchange (the 100 TB contract — scan-side CPU only)."""
    df = QUERIES["x65_url_canonicalize"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_crawl_budget_invariants(spark, sf_dir):
    """Budget cap binds per host; selection is deterministic; selected
    rows are a subset of the canonical corpus."""
    df = QUERIES["x67_crawl_budget"].spark(spark, sf_dir)
    rows = df.collect()
    per_host: dict[str, int] = {}
    for r in rows:
        per_host[r.host] = per_host.get(r.host, 0) + 1
        assert 1 <= r.crawl_rank <= _BUDGET
    assert max(per_host.values()) <= _BUDGET
    # the cap must actually prune at test scale (a budget the data
    # never reaches tests nothing)
    total = QUERIES["x65_url_canonicalize"].spark(spark, sf_dir).count()
    assert len(rows) < total
    # determinism: re-run selects the identical set
    again = {(r.doc_id, r.crawl_rank) for r in df.collect()}
    assert again == {(r.doc_id, r.crawl_rank) for r in rows}


def test_host_aggregation_consistent_with_urls(spark, sf_dir):
    """x66 host totals must re-add to the x65 corpus size."""
    agg = QUERIES["x66_host_aggregation"].spark(spark, sf_dir)
    n_urls = agg.agg(F.sum("n_urls")).collect()[0][0]
    assert n_urls == QUERIES["x65_url_canonicalize"].spark(spark, sf_dir).count()


def test_robots_filter_probe_side_broadcast(spark, sf_dir):
    """x70's anti-join must broadcast the rule side — the URL probe
    stream never shuffle-exchanges for the join itself (the only
    shuffle allowed is the demo rule table's host DISTINCT)."""
    df = QUERIES["x70_robots_filter"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the probe side must not be exchanged: every shuffle in the plan
    # belongs to the rules subtree (host distinct), bounded at 2
    # (partial + final distinct)
    assert plan.count("Exchange hashpartitioning") <= 2


def test_robots_filter_actually_prunes(spark, sf_dir):
    total = QUERIES["x65_url_canonicalize"].spark(spark, sf_dir).count()
    allowed = QUERIES["x70_robots_filter"].spark(spark, sf_dir).count()
    assert 0 < allowed < total


def test_bpe_pairs_keep_multiplicity(spark, sf_dir):
    """The pair counts must reflect every adjacent occurrence — a
    per-doc distinct (the dedup shingle behavior) would undercount."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table

    top = QUERIES["x71_bpe_pair_counts"].spark(spark, sf_dir).collect()
    assert len(top) == 20
    assert top[0].merge_rank == 1
    # counts strictly ordered with deterministic tiebreak
    ranks = [(r.cnt, r.pair) for r in sorted(top, key=lambda r: r.merge_rank)]
    assert ranks == sorted(ranks, key=lambda t: (-t[0], t[1]))
    # spot-check multiplicity: recount the top pair with plain python
    pair = top[0].pair
    a, b = pair.split(" ", 1)
    docs = read_table(spark, sf_dir, "documents").select("text").collect()
    expect = 0
    for row in docs:
        toks = row.text.strip().split()
        expect += sum(
            1 for i in range(len(toks) - 1) if toks[i] == a and toks[i + 1] == b
        )
    assert expect == top[0].cnt


def test_canonicalization_is_idempotent(spark, sf_dir):
    """canon(canon(u)) == canon(u) for the whole corpus — the fixpoint
    property that makes canonical URLs safe as dedup keys (a second
    normalization pass anywhere in a pipeline must be a no-op)."""
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.web import (
        sql_canon_parts,
    )

    once = QUERIES["x65_url_canonicalize"].spark(spark, sf_dir).select("url")
    twice = once.select(
        "url",
        F.expr(sql_canon_parts("url", "spark")["url"]).alias("url2"),
    )
    diverged = twice.filter(F.col("url") != F.col("url2")).count()
    assert diverged == 0
