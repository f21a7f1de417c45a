"""Decompose x46 PageRank's at-scale cost (round 15, VERDICT r14
item 4): time the edge derivation, the invariant build, the rank init
and each power iteration separately, so the fix targets the dominant
term instead of a guess.

``--shape old`` reproduces the round-14 build (union → distinct →
degree window riding every edge row → checkpoint; un-hinted iteration
joins) inline, so before/after runs use the same tree. ``--shape new``
is the round-15 build (one repartition(u) exchange, in-place
dedup/degree aggregates, AQE-off checkpoints that record hash(u)
partitioning, SHUFFLE_HASH iteration joins). ``--dump-iter-plan PATH``
writes the executed plan of the LAST iteration's aggregate — the
per-iteration evidence the entry-level dump can't show (iterations
execute during plan construction).

Each stage is timed at its own materialization boundary: checkpoints
make later stages read materialized state, so the deltas are marginal
costs (guide §1). The noop sink times the non-checkpoint stages.

Usage: python tools/profile_x46.py --sf-dir testdata/sf10 --shape new
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="testdata/sf10")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--shape", choices=["old", "new"], default="new")
    ap.add_argument("--dump-iter-plan")
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.graphrank import (
        BASE_US, DAMP_US, MICRO,
    )
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.lineage import (
        CheckpointRotator, truncate_lineage,
    )
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.session import get_spark
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import (
        read_table,
    )

    spark = get_spark()
    sc = spark.sparkContext
    out_json: dict = {"shape": args.shape}

    def timed(label: str, fn):
        sc.setJobDescription(f"x46 profile: {label}")
        t0 = time.perf_counter()
        r = fn()
        dt = round(time.perf_counter() - t0, 2)
        out_json[label] = dt
        print(f"# {label}: {dt}s", file=sys.stderr)
        sc.setJobDescription(None)
        return r

    o = read_table(spark, args.sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, args.sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    timed("1_edges_distinct_noop", lambda: noop(edges))

    if args.shape == "old":
        sym = (
            edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .union(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
            .distinct()
        )
        win = sym.withColumn("deg", F.count("*").over(Window.partitionBy("u")))
        out = timed(
            "2_invariant_checkpoint",
            lambda: truncate_lineage(
                win, False, storage_level=StorageLevel.MEMORY_AND_DISK
            ),
        )
        degs = None
        ranks = timed(
            "3_rank_init",
            lambda: out.select("u")
            .distinct()
            .select("u", F.lit(MICRO).cast("long").alias("rank_us"))
            .localCheckpoint(eager=True),
        )
    else:
        raw = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).union(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            out = timed(
                "2_invariant_checkpoint",
                lambda: truncate_lineage(
                    raw.repartition("u").dropDuplicates(["u", "v"]),
                    False,
                    storage_level=StorageLevel.MEMORY_AND_DISK,
                ),
            )
            degs = timed(
                "2b_degrees_checkpoint",
                lambda: truncate_lineage(
                    out.groupBy("u").agg(F.count("*").alias("deg")), False
                ),
            )
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        ranks = timed(
            "3_rank_init",
            lambda: degs.select(
                "u", F.lit(MICRO).cast("long").alias("rank_us")
            ).localCheckpoint(eager=True),
        )

    out_json["n_nodes"] = ranks.count()
    out_json["n_sym_rows"] = out.count()

    rot = CheckpointRotator(out, False)
    last_agg = None
    for i in range(args.iters):
        def one_iter(ranks=ranks):
            if args.shape == "old":
                contribs = out.join(ranks, "u").select(
                    F.col("v").alias("u"),
                    F.expr("rank_us div deg").alias("c"),
                )
            else:
                cu = ranks.join(degs.hint("SHUFFLE_HASH"), "u").select(
                    "u", F.expr("rank_us div deg").alias("c")
                )
                contribs = out.join(cu.hint("SHUFFLE_HASH"), "u").select(
                    F.col("v").alias("u"), "c"
                )
            nxt = (
                contribs.groupBy("u")
                .agg(F.sum("c").alias("s"))
                .select(
                    "u",
                    F.expr(
                        f"CAST({BASE_US} + "
                        f"(CAST({DAMP_US} AS DECIMAL(38,0)) * s) div {MICRO} "
                        f"AS BIGINT)"
                    ).alias("rank_us"),
                )
            )
            return nxt, rot.rotate(nxt)

        pair = timed(f"6_iteration_{i + 1}", one_iter)
        last_agg, ranks = pair

    if args.dump_iter_plan and last_agg is not None:
        # the rotated frame hides the iteration internals; the
        # un-rotated aggregate's executed plan (materialized by the
        # rotate's eager checkpoint on an identical instance) shows
        # the join strategy and exchange count — re-run it cheaply.
        last_agg.collect()
        with open(args.dump_iter_plan, "w") as fh:
            fh.write(
                last_agg._jdf.queryExecution().executedPlan().toString()
            )
        print(f"wrote {args.dump_iter_plan}", file=sys.stderr)

    print(json.dumps(out_json))
    return 0


if __name__ == "__main__":
    sys.exit(main())
