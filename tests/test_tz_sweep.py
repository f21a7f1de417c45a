"""Full-catalog oracle parity under a shifted session timezone.

The targeted shifted-TZ test (test_round4_ops._TZ_SENSITIVE) covers
the entries KNOWN to bucket by time; this sweep runs the ENTIRE
oracle catalog under Asia/Kolkata (+5:30 — half-hour offsets catch
what whole-hour zones mask) so the next latent renderer-through-the-
session-zone bug (q47's, caught by exactly this sweep in round 5)
cannot hide in an entry nobody thought was time-sensitive.

One test, one pass, failures collected — ~2-3 min at sf0.001.
Set SPARK_GRAFT_SKIP_TZ_SWEEP=1 to skip locally.
"""

from __future__ import annotations

import os

import pytest

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import QUERIES

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SKIP_TZ_SWEEP") == "1",
    reason="explicitly skipped",
)


def test_whole_catalog_matches_oracle_under_shifted_timezone(
    spark, duck, sf_dir
):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    mismatches: list[str] = []
    try:
        for name, spec in QUERIES.items():
            if spec.oracle is None:
                continue
            try:
                sp = spec.spark(spark, sf_dir).toPandas()
                du = duck.sql(spec.oracle).fetchdf()
                cols = sorted(sp.columns)
                if cols != sorted(du.columns):
                    mismatches.append(f"{name}: columns")
                    continue
                a = sorted(map(tuple, sp[cols].astype(str).values.tolist()))
                b = sorted(map(tuple, du[cols].astype(str).values.tolist()))
                if a != b:
                    mismatches.append(name)
            except Exception as exc:  # collect, don't abort the sweep
                mismatches.append(f"{name}: {exc!r:.80}")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert not mismatches, f"shifted-TZ divergence: {mismatches}"
