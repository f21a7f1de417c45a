"""Oracle-differential tests: every catalog query with an oracle must
match DuckDB on the same parquet (row-count + columns + values) — the
local mirror of the driver's CORRECTNESS gate (SURVEY.md §5.1)."""

from __future__ import annotations

import pytest

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import QUERIES
from tests.conftest import assert_frames_match

WITH_ORACLE = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.spark(spark, sf_dir)
    rel = duck.sql(spec.oracle)
    assert_frames_match(sdf, rel, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
