#!/usr/bin/env python
"""Whole-catalog multi-consumer-subtree audit (VERDICT r13 item 4).

Rounds 12–13 found three instances of one bug shape BY HAND: a frame
consumed ≥2× with either a poisoned (cache) or an absent
materialization boundary — x10's AQE-blocked trainer cache, x04's
signature cache, connected_components deriving its edge input twice.
This walker is the standing net: for every catalog entry it walks the
ANALYZED logical plan (py4j, no execution beyond what plan build
itself runs), finds subtrees that appear ≥2 times (semanticHash
equality), and classifies each duplicated subtree:

- ``checkpoint``: the duplicated subtree is a LogicalRDD — a
  local/durable checkpoint consumed from both branches. The boundary
  exists; the work under it runs once. OK by construction.
- ``narrow-recompute``: the duplicated subtree contains no expensive
  operator (Join/Aggregate/Generate/Window/Deduplicate/Distinct/
  Intersect/Except) — re-deriving it per consumer is a projection/
  filter over a scan, cheaper than any boundary. OK by construction.
- ``broadcast-literal``: the duplicated subtree is a ResolvedHint
  broadcast frame — bounded by the broadcast-policy audit
  (tools/audit_broadcasts.py), and identical broadcast exchanges are
  deduped by the physical ReuseExchange rule. OK.
- ``physical-reuse``: the subtree survives to the OPTIMIZED plan
  duplicated, but the compiled physical plan carries
  ReusedExchange/ReusedSubquery nodes — within one query execution
  Spark materializes identical exchange subtrees ONCE
  (spark.sql.exchange.reuse, on by default), so the duplication costs
  plan size, not computation. OK.
- ``FLAG``: an expensive subtree duplicated with no boundary, no
  broadcast bound, and no physical reuse in the compiled plan — the
  x10/x04/components shape. Every flag must be allowlisted here with
  a written why, or fixed.

The walk runs on the OPTIMIZED logical plan (not the analyzed one):
Catalyst prunes columns per consumer, so two analyzed-identical
subtrees frequently optimize into DIFFERENT narrow passes — each
reading only its consumer's columns, which is cheaper than one wide
materialization plus two reads; flagging the analyzed form would
report exactly the good outcome (first walker draft measured: 164
analyzed-level flags, almost all pruning-diverged or physically
reused).

Only the LARGEST duplicated subtree on each path is reported (its
children are duplicated by implication). Streaming entries (s*) are
skipped — they run real queries on build and their per-batch plans
are not the built frame's plan.

Usage:  python tools/audit_reuse.py [--sf-dir DIR] [--only a,b]
"""

from __future__ import annotations

import argparse
import sys
from collections import Counter

sys.path.insert(0, ".")

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.plan_audit import (  # noqa: E402
    _children,
    _cls,
    _leaf_table,
)

# operators whose presence makes re-deriving a subtree expensive —
# everything else (Project/Filter/scan/...) is narrow recompute
_EXPENSIVE = {
    "Join",
    "Aggregate",
    "Generate",
    "Window",
    "Deduplicate",
    "Distinct",
    "Intersect",
    "Except",
    "Sort",
    "RepartitionByExpression",
    "Repartition",
}

# Adjudicated duplicated-expensive-subtree sites:
#   entry -> {signature -> (max sites, why)}.
# A signature names the duplicated subtree's root class, the expensive
# node classes under it, and its leaf tables — replacing an allowlisted
# reuse with a different one re-surfaces (the audit_broadcasts.py
# signature-keyed discipline).
ALLOWLIST: dict[str, dict[str, tuple[int, str]]] = {
    "x123_negative_sampling_table": {
        "top=Filter expensive=Generate scans=documents x2": (
            1,
            "logical duplicate only: the EXECUTED plan carries exactly"
            " one Generate + one ReusedExchange (probed round 14) — the"
            " planner already runs the explode once; this walker's"
            " physical-reuse rescue doesn't fire because the duplicated"
            " subtree is Generate-topped, not exchange-topped",
        ),
    },
    "x23_tfidf_top_term": {
        "top=Generate expensive=Generate scans=documents x2": (
            1,
            "post-round-14 residue: the DF-from-TF rewrite leaves the"
            " token explode logically duplicated (two branches of the"
            " shared tf subtree) but the EXECUTED plan carries exactly"
            " one Generate + one ReusedExchange (probed — the no-op"
            " tf>=1 filter keeps the branches identical so reuse"
            " fires); Generate-topped, so the walker's exchange-topped"
            " physical-reuse rescue can't classify it automatically",
        ),
    },
    "x129_distinctive_terms": {
        "top=Filter expensive=Generate scans=documents x2": (
            2,  # pruning forks TWO variants; both carry this signature
            "per-consumer pruning forks st into two token-pass variants"
            " (each then ReuseExchange-shared by two consumers). A lazy"
            " checkpoint of st measured FLAT at both scales (sf0.01"
            " 0.846->0.851 s, sf10 1.747->1.754 s median, round 14) —"
            " the second narrow pass costs what the materialization"
            " saves; intentional recompute per SCALE.md rule 5"
            " economics",
        ),
    },
}


def _walk_subtrees(node, acc: list) -> None:
    acc.append(node)
    for ch in _children(node):
        _walk_subtrees(ch, acc)


def _expensive_under(node) -> set[str]:
    out: set[str] = set()

    def walk(n):
        c = _cls(n)
        if c in _EXPENSIVE:
            out.add(c)
        for ch in _children(n):
            walk(ch)

    walk(node)
    return out


def _leaves_under(node) -> list[str]:
    out: list[str] = []

    def walk(n):
        if not _children(n):
            out.append(_leaf_table(n) or _cls(n))
        for ch in _children(n):
            walk(ch)

    walk(node)
    return out


def audit_entry(df) -> list[tuple[str, str]]:
    """(classification, signature) per duplicated maximal subtree."""
    qe = df._jdf.queryExecution()
    root = qe.optimizedPlan()
    # compiled physical plan AFTER preparation rules (ReuseExchange /
    # ReuseSubquery run in QueryExecution.preparations — sparkPlan()
    # predates them): evidence that a duplicated logical subtree
    # executes once. No jobs run — this is plan compilation only.
    try:
        physical = qe.executedPlan().toString()
    except Exception:  # noqa: BLE001
        physical = ""
    has_physical_reuse = (
        "ReusedExchange" in physical or "ReusedSubquery" in physical
    )
    # Pre-order walk recording each subtree's [start, end) index span:
    # semanticHash works on the CANONICALIZED plan, which collapses
    # alias-only Projects — a rename Project hash-equals its own child,
    # so nested occurrences are the same computation, not two
    # consumers. A hash only counts as duplicated when two occurrences
    # are DISJOINT (neither contains the other).
    spans: dict[int, list[tuple[int, int]]] = {}
    by_hash: dict[int, list] = {}
    counter = [0]

    def index_walk(node):
        start = counter[0]
        counter[0] += 1
        for ch in _children(node):
            index_walk(ch)
        try:
            h = node.semanticHash()
        except Exception:  # noqa: BLE001 — py4j oddity: skip node
            return
        spans.setdefault(h, []).append((start, counter[0]))
        by_hash.setdefault(h, []).append(node)

    index_walk(root)

    def _has_disjoint(intervals: list[tuple[int, int]]) -> bool:
        ivs = sorted(intervals)
        for i in range(len(ivs) - 1):
            # sorted by start: disjoint iff the next start is past this end
            if ivs[i + 1][0] >= ivs[i][1]:
                return True
        return False

    dup_hashes = {
        h for h, ivs in spans.items() if len(ivs) >= 2 and _has_disjoint(ivs)
    }

    # keep only MAXIMAL duplicated subtrees: drop a duplicated hash if
    # some strictly larger duplicated subtree contains a node with it
    results: list[tuple[str, str]] = []
    reported: set[int] = set()

    def walk(node, inside_dup: bool):
        try:
            h = node.semanticHash()
        except Exception:  # noqa: BLE001
            h = None
        is_dup = h in dup_hashes if h is not None else False
        if is_dup and not inside_dup and h not in reported:
            reported.add(h)
            cls = _cls(node)
            if cls == "LogicalRDD":
                kind = "checkpoint"
            elif cls == "ResolvedHint":
                kind = "broadcast-literal"
            else:
                exp = _expensive_under(node)
                if not exp:
                    kind = "narrow-recompute"
                elif has_physical_reuse and (
                    exp & {"Join", "Aggregate", "Window", "Deduplicate",
                           "Distinct", "RepartitionByExpression",
                           "Repartition", "Sort"}
                ):
                    # exchange-topped duplicate + compiled plan shows
                    # reuse nodes: executes once
                    kind = "physical-reuse"
                else:
                    leaves = sorted(set(_leaves_under(node)))
                    sig = (
                        f"top={cls} expensive={','.join(sorted(exp))} "
                        f"scans={','.join(leaves)} x{len(by_hash[h])}"
                    )
                    results.append(("FLAG", sig))
                    kind = None
            if kind:
                results.append((kind, f"top={cls}"))
        for ch in _children(node):
            walk(ch, inside_dup or is_dup)

    walk(root, False)
    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ns = ap.parse_args()

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import (
        QUERIES,
    )
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.session import get_spark

    # AQE off: with AQE on, sparkPlan() is the AdaptiveSparkPlan
    # placeholder and the ReuseExchange evidence only appears in the
    # runtime-final plan — the bench/dump_plans regime (AQE off at
    # local scale) shows the compiled reuse directly
    spark = get_spark(
        app_name="audit_reuse",
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    only = [s for s in ns.only.split(",") if s]
    names = [
        n
        for n in sorted(QUERIES)
        if not n.startswith("s") and (not only or any(s in n for s in only))
    ]

    totals = Counter()
    violations = []
    errors = {}
    for name in names:
        try:
            df = QUERIES[name].spark(spark, ns.sf_dir)
            found = audit_entry(df)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:120]
            continue
        flags = Counter(sig for kind, sig in found if kind == "FLAG")
        for kind, _ in found:
            totals[kind] += 1
        allowed = ALLOWLIST.get(name, {})
        for sig, cnt in flags.items():
            cap = allowed.get(sig)
            if cap is None or cnt > cap[0]:
                violations.append((name, sig, cnt))
                print(f"FLAG {name}: {sig}")
            else:
                print(f"allowlisted {name}: {sig} — {cap[1]}")
    print(
        f"\n{len(names)} entries audited: "
        f"{totals['checkpoint']} checkpoint-boundary reuses, "
        f"{totals['broadcast-literal']} broadcast-literal reuses, "
        f"{totals['physical-reuse']} physically-reused duplicates, "
        f"{totals['narrow-recompute']} narrow recomputes, "
        f"{sum(totals[k] for k in totals if k == 'FLAG')} flagged, "
        f"{len(violations)} unallowlisted"
    )
    if errors:
        print(f"errors: {errors}")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
