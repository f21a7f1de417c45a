#!/usr/bin/env python
"""Full-catalog perf sweep at sf0.1: 1 warm + 2 timed passes per entry,
report min. Streaming entries (s*) excluded — they run real streaming
queries with fixed trigger overhead. Prints one line per query sorted
by time desc."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import QUERIES
from aws_etl_pipeline_financial_streamlit_dashboard_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(
    app_name="perf_sweep",
    master="local[32]",
    shuffle_partitions=8,
    extra_conf={"spark.sql.adaptive.enabled": "false"},
)
spark.sparkContext.setLogLevel("ERROR")

timings = {}
errors = {}
for name in sorted(QUERIES):
    if name.startswith("s"):  # streaming entries: trigger overhead dominates
        continue
    fn = QUERIES[name].spark
    try:
        fn(spark, sf_dir).collect()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    except Exception as exc:
        errors[name] = repr(exc)[:150]

for name, t in sorted(timings.items(), key=lambda kv: -kv[1]):
    print(f"{t:8.3f}  {name}")
print(json.dumps({"total": round(sum(timings.values()), 2), "n": len(timings)}))
if errors:
    print("ERRORS:", json.dumps(errors))
