#!/usr/bin/env python
"""DuckDB side of the headline bench: run each headline entry's oracle
SQL over the same parquet directory, same steady-state protocol as
bench.py (2 warm-up passes, then min of 3 timed passes, fresh
``con.execute(...).fetchall()`` per pass), threads matched to the Spark
session's core count. Prints one JSON line mirroring bench.py's shape
so the two artifacts diff cleanly.

Usage: SPARK_GRAFT_SF_DIR=... python tools/duck_headline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import duckdb  # noqa: E402

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import (  # noqa: E402
    headline_queries,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.schemas import (  # noqa: E402
    TESTDATA_TABLES,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={int(cpus)}")
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )

    timings: dict[str, float] = {}
    for name, spec in sorted(headline_queries().items()):
        sql = spec.oracle
        for _ in range(2):
            con.execute(sql).fetchall()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or sf_dir
    try:
        sf_value: float | str = float(sf_label)
    except ValueError:
        sf_value = sf_label
    print(
        json.dumps(
            {
                "metric": "duckdb_headline_total_sec",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf_value,
                "threads": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
