"""Whole-catalog broadcast-hint policy sweep (see plans/plan_audit.py
for the rule). Prints one line per flagged hint site; streaming
entries are skipped (they run a query on build — audited by hand).

The standing regression net for the entries that actually carried the
violation is tests/test_broadcast_policy.py; this tool is the
full-catalog sweep run when new entries land.

v2 (ADVICE r8): the allowlist keys on the FLAG SIGNATURE (the
``top=... scans=...`` string the classifier emits), not on a bare
count — under the count scheme, replacing an allowlisted bounded hint
with a new unbounded one at the same site count stayed green. Now any
change to WHAT is hinted (different subtree top, different scanned
relations) re-surfaces even when the site count is unchanged.

Usage:  python tools/audit_broadcasts.py [--sf-dir DIR] [--only a,b]
        [--emit-allowlist]   # print the observed {entry: {sig: n}}
                             # map for allowlist regeneration
"""

from __future__ import annotations

import argparse
import sys
from collections import Counter

sys.path.insert(0, ".")

# Bounded-by-construction broadcast frames my mechanical classifier
# cannot prove bounded (grouped by a bounded-domain key, offsets side
# tables, benchmark-sized eval sides): entry -> (allowed sites, why).
ALLOWLIST = {
    "q48_topk_per_group": (1, "broadcast of grouped_topk output (≤k·|segments| rows)"),
    "q59_ntile_quartiles": (2, "|partitions|-row offsets side tables (x42 pattern)"),
    "q78_lead_time_histogram": (1, "histogram bucket spine (bounded bucket domain)"),
    "x29_corpus_mix": (1, "per-source fraction frame (|sources|-bounded)"),
    "x30_decontamination": (1, "eval-side frame (benchmark-sized by construction)"),
    "x36_source_overlap": (2, "per-source-pair summaries (|sources|²-bounded)"),
    "x42_deterministic_shuffle": (1, "|partitions|-row offsets side table"),
    "x47_corpus_mix_deterministic": (1, "per-source fraction frame (|sources|-bounded)"),
    "x50_bm25_topk": (1, "query-term frame (bounded query set)"),
    "x53_span_decontamination": (1, "eval-side spans (benchmark-sized by construction)"),
    "x56_winsorize": (1, "per-source winsor bounds (|sources|-bounded)"),
    "x70_robots_filter": (1, "robots rules (|hosts|-sized, documented in operators/web.py)"),
    "x73_token_budget_mix": (1, "per-source token budgets (|sources|-bounded)"),
    "x84_join_key_skew_profile": (1, "top-k hot-key frame (bounded k)"),
    "x101_hybrid_rrf_retrieval": (2, "per-query rank frames + cosine query side (bounded query set)"),
    "x108_pq_recall": (3, "PQ codebooks (bounded 8 codewords/subspace) + query side"),
    "x110_loo_target_encoding": (1, "per-category label rollup (|categories|-bounded)"),
    "x112_memorization_score": (2, "generation-side gram set + matched-gram set (both generation-sample-bounded)"),
    # x104/x105 compose x30's eval-side broadcast (benchmark-sized) and
    # x47's per-source fraction frame; the audit entry forks the DAG per
    # stage, so the same two bounded hints recur once per downstream fork.
    "x104_corpus_pipeline_e2e": (3, "eval shingles (benchmark-sized) ×2 forks + mix fractions (|sources|)"),
    "x105_corpus_pipeline_audit": (8, "same two bounded hints across the 8 stage forks"),
    # q16/q34/q92/q93/q94: hints size-guarded via catalog.dim_fits_broadcast
    # / maybe_broadcast_dim (present only while the base dim fits the
    # threshold) — guard behavior pinned by tests/test_broadcast_policy.py.
    "q16_star_join_revenue": (1, "size-guarded via dim_fits_broadcast"),
    "q34_star_join_bucketed": (1, "size-guarded via dim_fits_broadcast"),
    "q92_two_nation_volume": (2, "size-guarded via maybe_broadcast_dim"),
    "q93_market_share": (2, "size-guarded via maybe_broadcast_dim"),
    "q94_promo_revenue_share": (1, "size-guarded via maybe_broadcast_dim"),
    "q96_product_type_profit": (1, "size-guarded via maybe_broadcast_dim"),
    "q97_important_stock": (4, "size-guarded ×2 (part+supplier), doubled by the grand-total fork"),
    "q98_specialized_suppliers": (1, "size-guarded via maybe_broadcast_dim"),
    "q99_supplier_part_counts": (1, "size-guarded via maybe_broadcast_dim"),
    # ANN / similarity family: the broadcast side is the QUERY or EVAL
    # set — workload-bounded in production (the vec_id % k modulus
    # sample is the testdata stand-in; the x30 eval-side discipline).
    # x96 additionally ships the shard-and-OR fallback for eval sets
    # that outgrow one broadcast. x10/x58's extra sites are the k
    # k-means centroid frames (bounded by k).
    "x09_cosine_topk": (1, "query side (workload-bounded)"),
    "x10_ivf_topk": (6, "query side + k-means centroid frames (bounded k)"),
    "x11_knn_join": (1, "query side (workload-bounded)"),
    "x16_embedding_dup_pairs": (1, "blocked pair probe side (bounded block)"),
    "x24_lsh_topk": (1, "query side (workload-bounded)"),
    "x57_knn_label_propagation": (2, "query/labeled side (workload-bounded)"),
    "x58_ivf_deterministic_topk": (3, "query side + centroid frames (bounded k)"),
    "x59_lsh_deterministic_topk": (1, "query side (workload-bounded)"),
    "x72_ann_recall_eval": (3, "query side ×3 rankers (workload-bounded)"),
    "x74_matryoshka_recall": (3, "query side ×ranker pair (workload-bounded)"),
    "x77_int8_recall": (3, "query side ×ranker pair (workload-bounded)"),
    "x90_hard_negatives": (1, "query side (workload-bounded)"),
    "x92_label_outliers": (1, "per-label centroid frame (bounded |labels|)"),
    "x96_semantic_decontamination": (1, "eval side; shard-and-OR fallback shipped"),
    "x98_anchor_positives": (1, "anchor side (workload-bounded)"),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default="")
    ap.add_argument("--emit-allowlist", action="store_true")
    args = ap.parse_args()

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.session import get_spark
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import QUERIES
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.plan_audit import (
        unbounded_broadcast_hints,
    )

    spark = get_spark()
    only = set(args.only.split(",")) if args.only else None
    violations = 0
    observed: dict[str, dict[str, int]] = {}
    for name, spec in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        if name[0] == "s" and name[1].isdigit():
            continue  # streaming entry: runs a query on build
        try:
            df = spec.spark(spark, args.sf_dir)
        except Exception as e:
            print(f"{name}: BUILD-ERROR {type(e).__name__}: {e}")
            violations += 1
            continue
        flags = Counter(unbounded_broadcast_hints(df))
        if flags:
            observed[name] = dict(sorted(flags.items()))
        allowed = ALLOWLIST.get(name, {})
        bad = False
        for sig, n in sorted(flags.items()):
            ent = allowed.get(sig)
            if ent is None:
                violations += 1
                bad = True
                print(f"{name}: FLAG x{n} (signature not allowlisted) {sig}")
            elif n > ent[0]:
                violations += 1
                bad = True
                print(f"{name}: FLAG x{n} (> allowed {ent[0]}) {sig}")
        if flags and not bad:
            whys = "; ".join(sorted({ent[1] for ent in allowed.values()}))
            print(f"{name}: ok ({sum(flags.values())} allowlisted: {whys})")
    if args.emit_allowlist:
        import json

        print(json.dumps(observed, indent=1, sort_keys=True))
    print(f"\n{violations} violation(s)")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
