"""Round-11 profiler: isolate the eval ladder's exact-GT dot-product
kernel (35 queries x 200k corpus = 7M pairs at sf10) and measure the
candidate restructurings VERDICT r10 item 1 names, before touching the
shared `_pairwise_sim` convention.

Variants (all produce the identical top-k result set unless noted):
  v0_current   knn_join_brute_force as shipped (per-pair float->double
               casts inside the unrolled dot).
  v1_precast   corpus+queries pre-cast to array<double> in a narrow
               projection; dot/norms drop the per-pair casts.
               float->double is exact, so values are bit-identical.
  v2_balanced  v1 + balanced-tree (pairwise) parenthesization of the
               64-term sum. CHANGES accumulation order -> pre-rounding
               doubles differ in ulps; speed probe only.
  v3_hof       aggregate(zip_with(...)) interpreted fold (the form the
               VERDICT asks re-measured for the record).
  v4_arrow     blocked numpy matmul via applyInPandas (the rows-only
               fast-path twin candidate): corpus packed into ~780-row
               blocks, queries as a 1-row broadcast pack, float64 BLAS
               cosine, per-block local top-k + skew-safe final top-k.

Usage: python tools/profile_dot_kernel.py --sf-dir testdata/sf10 --reps 3
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F

DIM = 64
K = 10
MOD = 29


def _terms_nc(a: str, b: str, dim: int) -> list[str]:
    return [f"get({a}, {i}) * get({b}, {i})" for i in range(dim)]


def _sql_dot_nc(a: str, b: str, dim: int) -> str:
    return "(0.0D + " + " + ".join(_terms_nc(a, b, dim)) + ")"


def _balanced(terms: list[str]) -> str:
    if len(terms) == 1:
        return terms[0]
    mid = len(terms) // 2
    return f"({_balanced(terms[:mid])} + {_balanced(terms[mid:])})"


def _prep(spark, sf_dir: str):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_ext import _q_sample_col
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.dedup import fan_out

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(_q_sample_col(MOD))
    return queries, fan_out(emb)


def v0_current(spark, sf_dir: str) -> DataFrame:
    import aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.similarity as S

    q, c = _prep(spark, sf_dir)
    return S.knn_join_brute_force(q, c, k=K, dim=DIM)


def _precast_sides(spark, sf_dir: str):
    q, c = _prep(spark, sf_dir)
    qd = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("__qvec"),
    ).withColumn("__qnrm", F.expr(
        "sqrt(0.0D + " + " + ".join(_terms_nc("__qvec", "__qvec", DIM)) + ")"
    ))
    cd = c.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("__cvec"),
    ).withColumn("__cnrm", F.expr(
        "sqrt(0.0D + " + " + ".join(_terms_nc("__cvec", "__cvec", DIM)) + ")"
    ))
    return qd, cd


def _rank_pairs(cands: DataFrame) -> DataFrame:
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.skew import grouped_topk

    return grouped_topk(
        cands,
        ["query_id"],
        [F.col("cosine_sim").desc(), F.col("neighbor_id")],
        K,
        rank_col="__rn",
    ).drop("__rn")


def _pair_kernel(spark, sf_dir: str, dot_sql: str) -> DataFrame:
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.functions.scalars import round_half_up as rhu

    qd, cd = _precast_sides(spark, sf_dir)
    sim = F.expr(dot_sql) / F.nullif(
        F.col("__cnrm") * F.col("__qnrm"), F.lit(0.0)
    )
    cands = (
        cd.crossJoin(F.broadcast(qd))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", rhu(sim, 6).alias("cosine_sim"))
    )
    return _rank_pairs(cands)


def v1_precast(spark, sf_dir: str) -> DataFrame:
    return _pair_kernel(spark, sf_dir, _sql_dot_nc("__cvec", "__qvec", DIM))


def v2_balanced(spark, sf_dir: str) -> DataFrame:
    return _pair_kernel(
        spark, sf_dir, _balanced(_terms_nc("__cvec", "__qvec", DIM))
    )


def v3_hof(spark, sf_dir: str) -> DataFrame:
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.functions.scalars import round_half_up as rhu
    import aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.similarity as S

    qd, cd = _precast_sides(spark, sf_dir)
    sim = S.dot(F.col("__cvec"), F.col("__qvec")) / F.nullif(
        F.col("__cnrm") * F.col("__qnrm"), F.lit(0.0)
    )
    cands = (
        cd.crossJoin(F.broadcast(qd))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", rhu(sim, 6).alias("cosine_sim"))
    )
    return _rank_pairs(cands)


def v4_arrow(spark, sf_dir: str) -> DataFrame:
    import pandas as pd

    q, c = _prep(spark, sf_dir)
    n_blocks = 256
    blocks = (
        c.select("vec_id", "embedding")
        .groupBy((F.col("vec_id") % n_blocks).alias("__blk"))
        .agg(F.collect_list(F.struct("vec_id", "embedding")).alias("__vs"))
    )
    qpack = q.select("vec_id", "embedding").agg(
        F.collect_list(F.struct("vec_id", "embedding")).alias("__qs")
    )
    paired = blocks.crossJoin(F.broadcast(qpack))

    schema = "query_id bigint, neighbor_id bigint, cosine_sim double"

    def topk_block(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        out = []
        for _, row in pdf.iterrows():
            vs = row["__vs"]
            qs = row["__qs"]
            cid = np.fromiter((v["vec_id"] for v in vs), dtype=np.int64)
            V = np.array([v["embedding"] for v in vs], dtype=np.float64)
            qid = np.fromiter((s["vec_id"] for s in qs), dtype=np.int64)
            Q = np.array([s["embedding"] for s in qs], dtype=np.float64)
            sims = Q @ V.T
            qn = np.sqrt((Q * Q).sum(axis=1))[:, None]
            cn = np.sqrt((V * V).sum(axis=1))[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = sims / (qn * cn)
            sims = np.floor(sims * 1e6 + 0.5) / 1e6
            for i in range(len(qid)):
                s = sims[i].copy()
                s[cid == qid[i]] = -np.inf
                take = min(K, len(cid))
                idx = np.lexsort((cid, -s))[:take]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid[i],
                            "neighbor_id": cid[idx],
                            "cosine_sim": s[idx],
                        }
                    )
                )
        return pd.concat(out) if out else pd.DataFrame(
            columns=["query_id", "neighbor_id", "cosine_sim"]
        )

    local = paired.groupBy("__blk").applyInPandas(topk_block, schema)
    return _rank_pairs(local)


VARIANTS = {
    "v0_current": v0_current,
    "v1_precast": v1_precast,
    "v2_balanced": v2_balanced,
    "v3_hof": v3_hof,
    "v4_arrow": v4_arrow,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="testdata/sf10")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--check", action="store_true",
                    help="also verify v1/v4 result sets match v0")
    args = ap.parse_args()

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.session import get_spark

    spark = get_spark()
    names = args.only or list(VARIANTS)
    out = {}
    for name in names:
        fn = VARIANTS[name]
        df = fn(spark, args.sf_dir)
        t0 = time.perf_counter()
        df.count()  # warm-up (codegen JIT + IO cache)
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
        base = {
            tuple(r)
            for r in v0_current(spark, args.sf_dir)
            .select("query_id", "neighbor_id")
            .collect()
        }
        for name in ("v1_precast", "v4_arrow"):
            got = {
                tuple(r)
                for r in VARIANTS[name](spark, args.sf_dir)
                .select("query_id", "neighbor_id")
                .collect()
            }
            out[f"{name}_set_eq_v0"] = got == base
            print(f"# {name} set == v0: {got == base}", file=sys.stderr)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
