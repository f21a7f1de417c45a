"""Round-11 plan pins for the eval-ladder fixes (docs/PERF.md
"Round-11: the eval-ladder floor is KILLED").

Three properties a refactor must not silently lose:

1. `_lsh_approx_ranked_spark` carries BOTH explicit width pins
   (pre-distinct on the distinct keys, post-distinct on the corpus
   join key). Dropping either re-serializes a compute-dense stage
   under AQE's byte-based coalescing — an 8× sf10 regression that no
   correctness test would catch.
2. `hyperplane_bucket_table_int` stays the exchange-free fold form —
   no Generate (posexplode) and no HashAggregate in its physical plan.
3. The fold kernels stay bit-identical to an independently constructed
   dim-unrolled reference (the pre-round-11 form, rebuilt HERE so the
   reference cannot drift with the production code).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators import similarity as S
from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table


def _emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def test_lsh_ranked_plan_carries_both_width_pins(spark, sf_dir):
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_ext import (
        _lsh_approx_ranked_spark,
    )

    df = _lsh_approx_ranked_spark(_emb(spark, sf_dir), 29, 10, 64)
    plan = df._jdf.queryExecution().toString()
    assert plan.count("REPARTITION_BY_NUM") >= 2, (
        "an explicit width pin was dropped from the LSH candidate "
        "pipeline — AQE will re-serialize the distinct/cosine stages "
        "(the measured 8× sf10 regression, docs/PERF.md round 11)"
    )


def test_int_bucket_table_is_exchange_free_fold_form(spark, sf_dir):
    bt = S.hyperplane_bucket_table_int(_emb(spark, sf_dir), 64, 4, 8)
    phys = bt._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in phys and "Generate" not in phys, (
        "bucket table regressed to the posexplode+aggregate form "
        "(extra exchange at scale; 2.3× slower at sf10)"
    )


def test_fold_kernels_match_independent_unrolled_reference(spark, sf_dir):
    """Rebuild the OLD dim-unrolled left-associated chain inside the
    test and assert the shipped fold kernels produce bit-identical
    doubles — the accumulation-order contract the DuckDB oracles
    depend on, pinned against an implementation the production code
    no longer contains."""
    dim = 64

    def unrolled_dot(a, b):
        terms = " + ".join(
            f"cast(get({a}, {i}) as double) * cast(get({b}, {i}) as double)"
            for i in range(dim)
        )
        return f"(0.0D + {terms})"

    def unrolled_norm2(a):
        terms = " + ".join(
            f"cast(get({a}, {i}) as double) * cast(get({a}, {i}) as double)"
            for i in range(dim)
        )
        return f"(0.0D + {terms})"

    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 60)
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("ia") < F.col("ib"))
    bad = pairs.select(
        F.expr(S._sql_dot("va", "vb", dim)).alias("f_dot"),
        F.expr(unrolled_dot("va", "vb")).alias("u_dot"),
        F.expr(S._sql_norm2("va", dim)).alias("f_n2"),
        F.expr(unrolled_norm2("va")).alias("u_n2"),
        S.l2_dist2_fixed("va", "vb", dim).alias("f_d2"),
        F.expr(
            "(0.0D + "
            + " + ".join(
                f"(cast(get(va, {i}) as double) - cast(get(vb, {i}) as double))"
                f" * (cast(get(va, {i}) as double) - cast(get(vb, {i}) as double))"
                for i in range(dim)
            )
            + ")"
        ).alias("u_d2"),
    ).filter(
        ~F.col("f_dot").eqNullSafe(F.col("u_dot"))
        | ~F.col("f_n2").eqNullSafe(F.col("u_n2"))
        | ~F.col("f_d2").eqNullSafe(F.col("u_d2"))
    )
    assert bad.count() == 0
