"""Round-12 A/B (VERDICT r11 item 1): fuse x108's four sequential
subspace k-means trainings into ONE subspace-keyed Lloyd DAG.

Variants:
  seq    the pre-round-12 shape — 4 × _kmeans_core over 16-dim slices
         (4 scans, 4 seed sorts, 2 eager centroid checkpoints EACH,
         4 identical assign/update plan chains run back to back),
         reconstructions joined pairwise on pid.
  fused  _kmeans_core_fused_subspaces — one scan quantizes the 64-dim
         vector once and slices micros, one broadcast-assign exchange
         per iteration over the (pid, sub) union, centroid state k×4
         rows, one checkpoint per round; recon = one (sub, cell)
         broadcast join + one groupBy(pid).

--check: collect both reconstruction tables and compare value-for-
value (exact integer micros → the fused form must be BIT-identical,
not approximately equal). Run at sf0.01 and sf0.1 before shipping.

Timing: each rep builds a FRESH pipeline (house rule — re-collecting
reuses materialized shuffle stages) and materializes the FULL x108
entry via collect(); 1 warm + --reps timed, median published.

Usage:
  python tools/profile_pq_fuse.py --check --sf-dir /root/testdata/sf0.01
  python tools/profile_pq_fuse.py --sf-dir testdata/sf10 --reps 3
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def _spark():
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.session import get_spark

    spark = get_spark(app_name="profile_pq_fuse", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _recon(spark, sf_dir: str, variant: str):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_ext import (
        _pq_recon_fused,
        _pq_recon_sequential,
    )
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return (_pq_recon_sequential if variant == "seq" else _pq_recon_fused)(emb)


def _entry(spark, sf_dir: str, variant: str):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_ext import (
        _pq_recon_fused,
        _pq_recon_sequential,
        _x108_pipeline,
    )

    builder = _pq_recon_sequential if variant == "seq" else _pq_recon_fused
    return _x108_pipeline(spark, sf_dir, builder)


def check(spark, sf_dir: str) -> bool:
    def rows(variant: str):
        return {
            r["vec_id"]: tuple(r["__cvec"])
            for r in _recon(spark, sf_dir, variant).collect()
        }

    a, b = rows("seq"), rows("fused")
    same = a == b
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_seq": len(a),
                "n_fused": len(b),
                "bit_identical": same,
            }
        )
    )
    if not same:
        diff = [k for k in a if a.get(k) != b.get(k)][:5]
        print("first differing vec_ids:", diff, file=sys.stderr)
    return same


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--check", action="store_true")
    ap.add_argument(
        "--variant",
        choices=["seq", "fused"],
        help="time only this variant (fresh-session single-variant runs "
        "exclude JIT warm-order effects between the two)",
    )
    args = ap.parse_args()

    spark = _spark()
    if args.check:
        return 0 if check(spark, args.sf_dir) else 1

    out = {}
    variants = (args.variant,) if args.variant else ("seq", "fused")
    for variant in variants:
        times = []
        for rep in range(args.reps + 1):  # rep 0 = warm
            t0 = time.perf_counter()
            _entry(spark, args.sf_dir, variant).collect()
            dt = time.perf_counter() - t0
            if rep > 0:
                times.append(dt)
        out[variant] = {
            "median_sec": round(statistics.median(times), 2),
            "band": [round(min(times), 2), round(max(times), 2)],
        }
    if "seq" in out and "fused" in out:
        out["speedup"] = round(
            out["seq"]["median_sec"] / out["fused"]["median_sec"], 2
        )
    print(json.dumps({"sf_dir": args.sf_dir, "reps": args.reps, **out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
