"""Round-11 follow-up profiler: decompose the post-fold eval ladder's
remaining ~25 s sf10 cost (x72/x125) into its LSH stages and measure a
fold-form bucket table against the shipped posexplode+agg form.

Stages:
  bt_current   hyperplane_bucket_table_int as shipped (posexplode →
               groupBy(id) with tables·planes conditional int sums →
               12.8M-row hash aggregate at sf10).
  bt_fold      same integer dots as per-row aggregate(zip_with(vec,
               plane_literal_array)) folds — a NARROW projection, no
               explode, no aggregate exchange. Integer arithmetic is
               exact, so bucket ids are bit-identical by construction
               (checked with --check).
  cand         candidate generation from the checkpointed bucket table
               (posexplode buckets → self-join on (t,b) → distinct).
  full         the whole _lsh_approx_ranked_spark.

Usage: python tools/profile_lsh_stage.py --sf-dir testdata/sf10 --reps 3
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Column, DataFrame, functions as F

DIM, PLANES, TABLES, MOD = 64, 4, 8, 29


def _emb(spark, sf_dir: str) -> DataFrame:
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table

    return read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def bt_current(spark, sf_dir: str) -> DataFrame:
    import aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.similarity as S

    return S.hyperplane_bucket_table_int(_emb(spark, sf_dir), DIM, PLANES, TABLES)


def bucket_table_int_fold(emb: DataFrame) -> DataFrame:
    import aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.similarity as S
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.dedup import fan_out

    base = fan_out(emb.select("vec_id", "embedding")).select(
        F.col("vec_id").alias("id"),
        F.expr(
            "transform(embedding, x ->"
            " CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))"
        ).alias("__vm"),
    )

    def dot_expr(t: int, p: int) -> str:
        arr = ",".join(
            f"{c}L" for c in S._plane_coeffs_mic(t, p, DIM, PLANES)
        )
        return (
            f"aggregate(zip_with(__vm, array({arr}), (x, c) -> x * c),"
            " 0L, (acc, v) -> acc + v)"
        )

    def bucket(t: int) -> Column:
        out = None
        for p in range(PLANES):
            bit = F.when(F.expr(dot_expr(t, p)) >= 0, F.lit(1)).otherwise(
                F.lit(0)
            ) * (1 << p)
            out = bit if out is None else out + bit
        return out

    return base.select(
        "id", F.array(*[bucket(t) for t in range(TABLES)]).alias("__buckets")
    )


def bt_fold(spark, sf_dir: str) -> DataFrame:
    return bucket_table_int_fold(_emb(spark, sf_dir))


def cand(spark, sf_dir: str) -> DataFrame:
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_ext import _q_sample_col
    import aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.similarity as S

    bt = S.hyperplane_bucket_table_int(
        _emb(spark, sf_dir), DIM, PLANES, TABLES
    ).localCheckpoint(eager=True)
    ex = bt.select("id", F.posexplode("__buckets").alias("t", "b"))
    qe = ex.filter(_q_sample_col(MOD, "id")).select(
        F.col("id").alias("query_id"), "t", "b"
    )
    return (
        ex.select(F.col("id").alias("neighbor_id"), "t", "b")
        .join(qe, ["t", "b"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )


def full(spark, sf_dir: str) -> DataFrame:
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_ext import (
        _lsh_approx_ranked_spark,
    )

    return _lsh_approx_ranked_spark(_emb(spark, sf_dir), MOD, 10, DIM)


STAGES = {
    "bt_current": bt_current,
    "bt_fold": bt_fold,
    "cand": cand,
    "full": full,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="testdata/sf10")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.session import get_spark

    spark = get_spark()
    out = {}
    for name in args.only or list(STAGES):
        fn = STAGES[name]
        t0 = time.perf_counter()
        fn(spark, args.sf_dir).count()
        warm = round(time.perf_counter() - t0, 3)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).count()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "median": round(statistics.median(times), 3),
            "band": [min(times), max(times)],
            "cold": warm,
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)

    if args.check:
        cur = {
            r["id"]: list(r["__buckets"])
            for r in bt_current(spark, args.sf_dir).collect()
        }
        new = {
            r["id"]: list(r["__buckets"])
            for r in bt_fold(spark, args.sf_dir).collect()
        }
        out["fold_eq_current"] = cur == new
        print(f"# fold buckets == current: {cur == new}", file=sys.stderr)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
