"""Decompose headline-query wall time into plan-build vs execution
(fresh plan per pass, bench.py session config) and measure the harness
floors alongside — the measurement behind docs/PERF.md's fixed-cost
decomposition. Usage: python tools/profile_headline.py [names...]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import QUERIES  # noqa: E402
from aws_etl_pipeline_financial_streamlit_dashboard_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or ["q07_flagship_industry_avg", "q08_monthly_avg_series"]
    spark = get_spark(
        app_name="profile",
        master="local[32]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def steady(fn, passes=5, warm=3):
        for _ in range(warm):
            fn()
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    noop = steady(lambda: spark.range(1).selectExpr("CAST(1 AS INT) AS one").collect())
    twoex = steady(
        lambda: spark.range(8)
        .repartition(8, "id")
        .groupBy((F.col("id") % 2).alias("k"))
        .count()
        .collect()
    )
    print(f"floor_noop={noop:.4f}s floor_2ex={twoex:.4f}s")

    for name in names:
        q = QUERIES[name].spark
        build = steady(lambda: q(spark, sf_dir))
        total = steady(lambda: q(spark, sf_dir).collect())
        print(
            f"{name}: total={total:.4f}s build={build:.4f}s "
            f"exec={total - build:.4f}s exec-minus-2ex-floor="
            f"{total - build - twoex:.4f}s"
        )


if __name__ == "__main__":
    main()
