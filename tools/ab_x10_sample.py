#!/usr/bin/env python
"""A/B: x10's IVF build with vs without the size-gated training
subsample (round 14, VERDICT r13 item 6). Run each variant in its OWN
process (cold session — the r13 protocol for this entry; a warm
session's JIT state shifts all variants together):

    SPARK_GRAFT_SF_DIR=$PWD/testdata/sf10 python tools/ab_x10_sample.py sampled
    SPARK_GRAFT_SF_DIR=$PWD/testdata/sf10 python tools/ab_x10_sample.py full

Prints cold first pass + N honest fresh-plan repeats (no cache — each
pass re-trains; the r13 "honest repeat" protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators import similarity as S  # noqa: E402
from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table  # noqa: E402
from aws_etl_pipeline_financial_streamlit_dashboard_spark.session import get_spark  # noqa: E402


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "sampled"
    reps = int(os.environ.get("AB_REPS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"ab_x10_{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    sample_rows = 25_000 if variant == "sampled" else 0

    def run() -> float:
        # x10_ivf_topk's exact body (catalog_ext.py) + the sampling knob
        emb = read_table(spark, sf_dir, "embeddings")
        t0 = time.perf_counter()
        rows = S.ivf_topk(
            emb, query_id=1, k=10, n_cells=16, n_probe=4, dim=64,
            train_sample_rows=sample_rows,
        ).collect()
        assert len(rows) == 10
        return time.perf_counter() - t0

    cold = run()
    repeats = [run() for _ in range(reps)]
    print(json.dumps({
        "variant": variant, "sf_dir": sf_dir,
        "cold_first_pass_sec": round(cold, 2),
        "honest_repeats_sec": [round(r, 2) for r in repeats],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
