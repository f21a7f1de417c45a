"""Per-entry A/B timer: run named catalog entries at a given sf_dir and
print one JSON line {entry: {"median": s, "band": [min, max]}}.

Used for before/after measurements when a plan-affecting change lands
(e.g. the round-8 broadcast-hint removals): run on the pre-change tree,
apply the change, run again, commit both numbers to docs/PERF.md.

Usage: python tools/ab_entries.py --sf-dir testdata/sf10 --reps 3 q85_... q86_...
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--sf-dir", default="testdata/sf10")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.session import get_spark
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import QUERIES

    spark = get_spark()
    out = {}
    for name in args.entries:
        # Release the PREVIOUS entry's checkpoint blocks before timing
        # this one: localCheckpoint RDD blocks are un-evictable and only
        # freed when the driver GC drops the py4j handle — in a batch
        # session the leftovers accumulate in the block manager and
        # distorted round-14 sf10 draws (a 5.7 s entry wedged for 17 min
        # after x80's corpus-scale rounds ran in the same session).
        import gc

        gc.collect()
        spec = QUERIES[name]
        spec.spark(spark, args.sf_dir).collect()  # warm-up (IO cache, codegen)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            spec.spark(spark, args.sf_dir).collect()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "median": round(statistics.median(times), 3),
            "band": [min(times), max(times)],
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
