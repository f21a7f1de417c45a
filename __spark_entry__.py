"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the package; this module only adapts the
catalog (plans/catalog.py) to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the multi-AVG group-by over a 3-way left-join chain
    — the reference's most complex query shape (Frontend.py:60-69; see
    plans.catalog.q07_flagship_industry_avg).
    """
    return QUERIES["q07_flagship_industry_avg"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; omitted entries (hash-based
    signatures, approximate ANN) get the driver's rows-only check."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
