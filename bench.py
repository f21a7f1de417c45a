#!/usr/bin/env python
"""Benchmark runner (driver contract, BASELINE.md).

Runs the headline catalog queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed twice: a warm-up pass (JIT, code-gen, file
listing) then the timed pass — the driver's number should measure the
engine, not JVM warm-up. Results are fully materialized via count()
on a cached-nothing plan (no collect of wide rows to the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import (  # noqa: E402
    QUERIES,
    headline_queries,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.session import get_spark  # noqa: E402


def _shuffle_partitions(sf_dir: str, cpus: int) -> int:
    """Size the shuffle by the data, not the core count.

    Rule: one partition per ~64 MB of input (the AQE advisory target),
    floored at 8 so tiny scale factors still exercise parallel reduce
    paths, capped at 4× cores. At sf0.1 (~17 MB total) this yields 8 —
    32 reducers on 600k rows is pure scheduling overhead; at cluster
    scale the byte-based term dominates and AQE coalesces from there.
    """
    total = 0
    try:
        for f in os.listdir(sf_dir):
            total += os.path.getsize(os.path.join(sf_dir, f))
    except OSError:
        return cpus
    return max(8, min(4 * cpus, total // (64 << 20)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=_shuffle_partitions(sf_dir, int(cpus)),
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = sorted(headline_queries())
    extra = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if extra:  # run an explicit list instead (debugging aid)
        names = [n.strip() for n in extra.split(",") if n.strip() in QUERIES]

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        fn = QUERIES[name].spark
        try:
            fn(spark, sf_dir).count()  # warm-up: listing, codegen, JIT
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # one broken query must not zero the bench
            errors[name] = repr(exc)[:200]

    sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or sf_dir
    try:
        sf_value: float | str = float(sf_label)
    except ValueError:
        sf_value = sf_label
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_value,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
