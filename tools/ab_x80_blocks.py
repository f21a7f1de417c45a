"""Shared-session block-leak A/B for x80's BPE rounds (round 15,
VERDICT r14 item 2).

Round 14 observed: after x80's corpus-scale rounds ran in a batch
session, leftover localCheckpoint blocks (pinned, GC-released only)
wedged an unrelated 5.7 s entry for 17 minutes; tools/ab_entries.py
papered over it with a driver-side gc.collect(). The operator-level
fix routes the per-round sequence state through
lineage.CheckpointRotator's local tier (round N-1's blocks unpersist
the moment round N materializes).

This script runs, in ONE session with NO gc.collect():
  1. x80_bpe_merges at --sf-dir (corpus-scale rounds),
  2. the block-manager census (persistent RDDs + stored block bytes),
  3. a small follow-on entry, timed.

``--legacy`` monkeypatches the rotator's local tier back to the
round-14 behavior (plain truncate_lineage, no unpersist) so the A and
B legs run the same tree.

Usage: python tools/ab_x80_blocks.py --sf-dir testdata/sf10 [--legacy]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def census(spark) -> dict:
    sc = spark.sparkContext._jsc.sc()
    infos = sc.getRDDStorageInfo()
    return {
        "persistent_rdds": int(sc.getPersistentRDDs().size()),
        "stored_rdds": len(infos),
        "mem_used_mb": round(
            sum(i.memSize() for i in infos) / (1024 * 1024), 1
        ),
        "disk_used_mb": round(
            sum(i.diskSize() for i in infos) / (1024 * 1024), 1
        ),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="testdata/sf10")
    ap.add_argument("--follow", default="x122_link_prediction")
    ap.add_argument("--legacy", action="store_true")
    args = ap.parse_args()

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators import lineage
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import (
        QUERIES,
    )
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.session import get_spark

    if args.legacy:
        orig = lineage.CheckpointRotator.rotate

        def legacy_rotate(self, df):
            if not self._reliable:
                return lineage.truncate_lineage(df, reliable=False)
            return orig(self, df)

        lineage.CheckpointRotator.rotate = legacy_rotate

    spark = get_spark()
    out = {"legacy": args.legacy}

    t0 = time.perf_counter()
    QUERIES["x80_bpe_merges"].spark(spark, args.sf_dir).collect()
    out["x80_sec"] = round(time.perf_counter() - t0, 2)
    out["census_after_x80"] = census(spark)

    t0 = time.perf_counter()
    QUERIES[args.follow].spark(spark, args.sf_dir).collect()
    out[f"{args.follow}_sec"] = round(time.perf_counter() - t0, 2)
    out["census_after_follow"] = census(spark)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
