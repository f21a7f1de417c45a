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
# tables, benchmark-sized eval sides):
#   entry -> {flag signature -> (max sites with that signature, why)}.
# Signature-keyed (ADVICE r8): replacing a bounded hint with a new
# unbounded one at the same count changes the signature and
# re-surfaces. Regenerate observed signatures with --emit-allowlist.
#
# ``LogicalRDD:unknown`` signatures (ADVICE r9): a localCheckpoint
# erases the bounding Aggregate/Limit from the plan, so the walker's
# DEFAULT-LINEAR rule names the checkpointed frame unknown instead of
# silently passing it — each such site below is adjudicated bounded by
# the construction the checkpoint hid (centroid/codebook/fraction/
# margin/offsets frames; see the entry docstrings).
ALLOWLIST = {
    "x130_countmin_bigrams": {
        "top=Aggregate scans=documents": (
            1,
            "the count-min sketch frame: groupBy(r, c) where r < D and"
            " c = hash % W — D·W rows (= 1024) by CONSTRUCTION, constants"
            " independent of data volume",
        ),
    },
    "x94_semantic_dedup": {
        "top=LogicalRDD scans=LogicalRDD:unknown": (3, "checkpointed k-means centroid frames (bounded k)"),
    },
    "x88_ivf_cell_occupancy": {
        "top=LogicalRDD scans=LogicalRDD:unknown": (2, "checkpointed k-means centroid frames (bounded k)"),
    },
    "x51_kmeans_deterministic": {
        "top=LogicalRDD scans=LogicalRDD:unknown": (1, "checkpointed k-means centroid frame (bounded k)"),
    },
    "x93_source_drift_chi2": {
        "top=Aggregate scans=LogicalRDD:unknown": (1, "per-bucket margin (|buckets|-bounded) over the checkpointed (source,bucket) counts"),
    },
    "q79_rfm_segmentation": {
        "top=Project scans=LogicalRDD:unknown": (2, "|partitions|-row ntile_at_scale offsets side tables (q59/x42 pattern; custkey renamed so the marker cannot name it)"),
    },
    "q66_market_beta": {
        "top=Aggregate scans=LogicalRDD:unknown": (1, "per-day market aggregate (|days|-bounded) over the checkpointed daily-close"),
    },
    "q16_star_join_revenue": {
        "top=SubqueryAlias scans=customer": (1, "size-guarded via dim_fits_broadcast (cust_region fold)"),
    },
    "q34_star_join_bucketed": {
        "top=SubqueryAlias scans=customer": (1, "size-guarded via dim_fits_broadcast (cust_region fold)"),
    },
    "q48_topk_per_group": {
        "top=Project scans=customer": (1, "broadcast of grouped_topk output (<=k*|segments| rows)"),
    },
    "q59_ntile_quartiles": {
        "top=Project scans=LogicalRDD:c_custkey": (2, "|partitions|-row offsets side tables (x42 pattern)"),
    },
    "q78_lead_time_histogram": {
        "top=Aggregate scans=lineitem,orders": (1, "histogram bucket spine (bounded week-bucket domain)"),
    },
    "q92_two_nation_volume": {
        "top=Project scans=customer": (1, "size-guarded via maybe_broadcast_dim"),
        "top=Project scans=supplier": (1, "size-guarded via maybe_broadcast_dim"),
    },
    "q93_market_share": {
        "top=Project scans=customer": (1, "size-guarded via maybe_broadcast_dim"),
        "top=Project scans=supplier": (1, "size-guarded via maybe_broadcast_dim"),
    },
    "q94_promo_revenue_share": {
        "top=Project scans=part": (1, "size-guarded via maybe_broadcast_dim"),
    },
    "q96_product_type_profit": {
        "top=Project scans=supplier": (1, "size-guarded via maybe_broadcast_dim"),
    },
    "q97_important_stock": {
        "top=Project scans=part": (2, "size-guarded x2 (part+supplier), doubled by the grand-total fork"),
        "top=Project scans=supplier": (2, "size-guarded x2 (part+supplier), doubled by the grand-total fork"),
    },
    "q98_specialized_suppliers": {
        "top=Project scans=part": (1, "size-guarded via maybe_broadcast_dim"),
    },
    "q99_supplier_part_counts": {
        "top=Project scans=part": (1, "size-guarded via maybe_broadcast_dim (size IN-list slice)"),
    },
    "x09_cosine_topk": {
        "top=Project scans=embeddings": (1, "query side (workload-bounded)"),
    },
    "x101_hybrid_rrf_retrieval": {
        "top=Aggregate scans=documents": (1, "per-query rank frames + cosine query side (bounded query set)"),
        "top=Project scans=embeddings": (1, "per-query rank frames + cosine query side (bounded query set)"),
    },
    "x104_corpus_pipeline_e2e": {
        "top=Deduplicate scans=documents": (2, "eval shingles (benchmark-sized) x2 forks"),
        "top=LogicalRDD scans=LogicalRDD:unknown": (1, "checkpointed mix-fraction frame (|sources|-bounded, x47 stage)"),
        "top=Project scans=LogicalRDD:unknown,documents": (1, "mix fractions joined to the per-source rollup (|sources|-bounded)"),
    },
    "x105_corpus_pipeline_audit": {
        "top=Deduplicate scans=documents": (6, "same bounded hints recurring across the 8 stage forks"),
        "top=LogicalRDD scans=LogicalRDD:unknown": (2, "checkpointed mix-fraction frames across forks (|sources|-bounded)"),
        "top=Project scans=LogicalRDD:unknown,documents": (2, "mix fractions joined to per-source rollups across forks (|sources|-bounded)"),
    },
    "x108_pq_recall": {
        "top=LogicalRDD scans=LogicalRDD:unknown": (4, "checkpointed PQ codebooks per subspace (bounded 8 codewords x 4 subspaces)"),
        "top=Project scans=LogicalRDD:unknown": (4, "codebook-derived projections (same bounded frames)"),
        "top=Project scans=embeddings": (3, "capped query side (_QUERY_ID_CAP)"),
    },
    "x10_ivf_topk": {
        "top=Project scans=embeddings": (6, "query side + k-means centroid frames (bounded k)"),
    },
    "x110_loo_target_encoding": {
        "top=Aggregate scans=customer": (1, "per-category label rollup (|categories|-bounded)"),
    },
    "x112_memorization_score": {
        "top=Deduplicate scans=documents": (1, "generation-side gram set + matched-gram set (both generation-sample-bounded)"),
        "top=Project scans=documents": (1, "generation-side gram set + matched-gram set (both generation-sample-bounded)"),
    },
    "x11_knn_join": {
        "top=Project scans=embeddings": (1, "query side (workload-bounded)"),
    },
    "x16_embedding_dup_pairs": {
        "top=Project scans=embeddings": (1, "blocked pair probe side (bounded block)"),
    },
    "x24_lsh_topk": {
        "top=Project scans=embeddings": (1, "query side (workload-bounded)"),
    },
    "x29_corpus_mix": {
        "top=LogicalRDD scans=LogicalRDD:unknown": (1, "checkpointed per-source fraction frame (|sources|-bounded)"),
        "top=Project scans=LogicalRDD:unknown,documents": (1, "fraction frame joined to the per-source rollup (|sources|-bounded either side)"),
    },
    "x30_decontamination": {
        "top=Deduplicate scans=documents": (1, "eval-side frame (benchmark-sized by construction)"),
    },
    "x35_mad_outliers": {
        "top=Aggregate scans=events": (3, "per-event-type median/MAD frames (bounded |event_types| domain; hint subtree recurs per downstream fork)"),
        "top=Project scans=events": (1, "per-event-type median/MAD frames (bounded |event_types| domain; hint subtree recurs per downstream fork)"),
    },
    "x36_source_overlap": {
        "top=Project scans=documents": (2, "per-source-pair summaries (|sources|^2-bounded)"),
    },
    "x42_deterministic_shuffle": {
        "top=Project scans=LogicalRDD:doc_id": (1, "|partitions|-row offsets side table"),
    },
    "x47_corpus_mix_deterministic": {
        "top=LogicalRDD scans=LogicalRDD:unknown": (1, "checkpointed per-source fraction frame (|sources|-bounded)"),
        "top=Project scans=LogicalRDD:unknown,documents": (1, "fraction frame joined to the per-source rollup (|sources|-bounded either side)"),
    },
    "x50_bm25_topk": {
        "top=Aggregate scans=documents": (1, "query-term frame (bounded query set)"),
    },
    "x53_span_decontamination": {
        "top=Deduplicate scans=documents": (1, "eval-side spans (benchmark-sized by construction)"),
    },
    "x56_winsorize": {
        "top=Project scans=documents": (1, "per-source winsor bounds (|sources|-bounded)"),
    },
    "x57_knn_label_propagation": {
        "top=Project scans=embeddings": (2, "query/labeled side (workload-bounded)"),
    },
    "x58_ivf_deterministic_topk": {
        "top=LogicalRDD scans=LogicalRDD:unknown": (1, "checkpointed centroid frame (bounded k)"),
        "top=Project scans=LogicalRDD:unknown,embeddings": (1, "centroid frame joined to the capped query side"),
        "top=Project scans=embeddings": (2, "query side (workload-bounded)"),
    },
    "x59_lsh_deterministic_topk": {
        "top=Project scans=embeddings": (1, "query side (workload-bounded)"),
    },
    "x70_robots_filter": {
        "top=Union scans=documents": (1, "robots rules (|hosts|-sized, documented in operators/web.py)"),
    },
    "x72_ann_recall_eval": {
        "top=Project scans=embeddings": (3, "capped query side x3 rankers (_QUERY_ID_CAP)"),
    },
    "x117_score_decile_lift": {
        "top=Project scans=LogicalRDD:doc_id": (2, "|partitions|-row offsets side tables (ntile_at_scale/global_rank — q59/x42 pattern)"),
    },
    "x120_curriculum_interleave": {
        "top=Project scans=LogicalRDD:doc_id": (2, "|partitions|-row global_rank offsets side tables + 1-row total (q59/x42 pattern)"),
    },
    "x125_mrr_map_eval": {
        "top=Project scans=embeddings": (3, "capped query side, x72's shared LSH+GT blocks (_QUERY_ID_CAP)"),
    },
    "x129_distinctive_terms": {
        "top=Aggregate scans=documents": (1, "per-source token-total margin (|sources|-bounded)"),
    },
    "x126_quantile_calibration": {
        "top=Project scans=LogicalRDD:doc_id": (2, "|partitions|-row global_rank offsets side tables x2 enumerations (q59/x42 pattern)"),
        "top=Project scans=documents": (1, "per-source count/offset frame (|sources|-bounded prefix sums)"),
    },
    "x127_consistent_hash_sharding": {
        "top=Aggregate scans=documents": (1, "per-shard naive-movement rollup (|shards|-bounded, <=9 rows)"),
    },
    "x73_token_budget_mix": {
        "top=Aggregate scans=LogicalRDD:doc_id": (1, "per-source token budgets (|sources|-bounded)"),
    },
    "x74_matryoshka_recall": {
        "top=Project scans=embeddings": (3, "capped query side x ranker pair (_QUERY_ID_CAP)"),
    },
    "x77_int8_recall": {
        "top=Project scans=embeddings": (3, "capped query side x ranker pair (_QUERY_ID_CAP)"),
    },
    "x84_join_key_skew_profile": {
        "top=Aggregate scans=lineitem": (1, "top-k hot-key frame (bounded k)"),
    },
    "x90_hard_negatives": {
        "top=Project scans=embeddings": (1, "query side (workload-bounded)"),
    },
    "x92_label_outliers": {
        "top=Project scans=embeddings": (1, "per-label centroid frame (bounded |labels|)"),
    },
    "x96_semantic_decontamination": {
        "top=Project scans=embeddings": (1, "eval side; shard-and-OR fallback shipped"),
    },
    "x98_anchor_positives": {
        "top=Project scans=embeddings": (1, "anchor side (workload-bounded)"),
    },
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
