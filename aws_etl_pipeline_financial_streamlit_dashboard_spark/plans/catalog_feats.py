"""Feature-engineering operators (round 8): leakage-safe target
encoding and sequence-transition statistics — the tabular/behavioral
feature steps between raw tables and a training matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import register
from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table

# ---------------------------------------------------------------------------
# x110 — leave-one-out target encoding
# ---------------------------------------------------------------------------

_X110_ORACLE = """
    WITH lab AS (
        SELECT c_custkey, c_mktsegment,
               CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS label
        FROM customer
    ),
    seg AS (
        SELECT c_mktsegment,
               CAST(SUM(label) AS BIGINT) AS n_pos,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lab GROUP BY c_mktsegment
    )
    SELECT l.c_custkey, l.c_mktsegment,
           CAST(l.label AS BIGINT) AS label,
           CAST(CASE WHEN s.n <= 1 THEN -1
                     ELSE (1000000 * (s.n_pos - l.label)) // (s.n - 1)
                END AS BIGINT) AS loo_enc_ppm
    FROM lab l JOIN seg s ON l.c_mktsegment = s.c_mktsegment
"""


@register(
    "x110_loo_target_encoding",
    _X110_ORACLE,
    doc="""Leave-one-out target encoding — the leakage-safe form of the
    standard categorical feature: each customer's segment is encoded
    as the share of NEGATIVE-BALANCE customers in that segment
    computed over every row EXCEPT ITSELF ((Σlabel − own) / (n − 1)),
    so the feature can never contain the row's own label (the naive
    mean encoding leaks the target and inflates validation scores —
    the exact failure this operator family exists to prevent).
    Encoding in exact integer ppm; singleton categories emit the -1
    sentinel (no peers to encode from) rather than NULL or a divide
    fault.

    Scale: ONE per-category aggregate (|categories| rows, broadcast
    back) and a row-local arithmetic finish — the per-row leave-out
    needs no self-join because (Σ − own)/(n − 1) is algebraically
    row-local once the category sums exist. Embarrassingly parallel
    at any corpus size.""",
)
def x110_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    lab = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.expr("CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END").alias("label"),
    )
    seg = lab.groupBy("c_mktsegment").agg(
        F.expr("CAST(SUM(label) AS BIGINT)").alias("n_pos"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
    )
    return (
        lab.join(F.broadcast(seg), "c_mktsegment")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.col("label").cast("bigint").alias("label"),
            F.expr(
                "CAST(CASE WHEN n <= 1 THEN -1"
                " ELSE (1000000 * (n_pos - label)) div (n - 1)"
                " END AS BIGINT)"
            ).alias("loo_enc_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# x111 — event-sequence transition matrix
# ---------------------------------------------------------------------------

_X111_ORACLE = """
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    tr AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n_transitions,
           CAST((1000000 * n_transitions)
                // SUM(n_transitions) OVER (PARTITION BY prev_type)
                AS BIGINT) AS prob_ppm
    FROM tr
"""


@register(
    "x111_event_transition_matrix",
    _X111_ORACLE,
    doc="""First-order Markov transition matrix over user event
    sequences: per (previous event type → next event type), the
    transition count and row-normalized probability in exact integer
    ppm — the behavioral-sequence statistic that feeds next-event
    training data, funnel anomaly detection, and session simulators.
    Ordering is the total (ts, event_id) exchange order, so every
    count is deterministic.

    Scale: ONE user-keyed window exchange (the LAG), then a
    |types|²-bounded aggregate; the normalizing window runs over the
    bounded matrix, never the fact table. Hot users skew the window
    partition at most by their own event count — the per-user
    sequence is the irreducible unit of this computation (exactly
    the watermark/session-state grain the streaming twin would
    keep).""",
)
def x111_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    tr = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_transitions"))
    )
    return tr.withColumn(
        "prob_ppm",
        F.expr(
            "CAST((1000000 * n_transitions) div "
            "SUM(n_transitions) OVER (PARTITION BY prev_type) AS BIGINT)"
        ),
    )
