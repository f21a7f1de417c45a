"""Mergeability pins for the round-9 deterministic sketches.

x113 (HLL) and x114 (histogram quantiles) justify their 100 TB shape
by ASSOCIATIVE MERGE: shards/days/executors combine without
re-scanning (registers by MAX, histograms by bucket-wise SUM). These
tests pin that algebra on the data itself, DuckDB-only (the property
is engine-independent; the cross-engine value equality of the full
entries is the driver gate's job): split lineitem into two arbitrary
shards, sketch each, merge, and require bit-equality with the sketch
of the whole — for registers, totals, AND the derived estimates.
"""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.01"

_HLL_REG = """
    SELECT l_returnflag, h % 256 AS bucket,
           MAX(CASE WHEN h // 256 = 0 THEN 25
                    ELSE 25 - length(bin(h // 256)) END) AS m
    FROM (
        SELECT l_returnflag,
               ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))
                   ::UBIGINT::BIGINT AS h
        FROM read_parquet('{src}/lineitem.parquet')
        WHERE {pred}
    )
    GROUP BY l_returnflag, h % 256
"""


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_hll_registers_merge_by_max(con):
    whole = con.sql(_HLL_REG.format(src=SF, pred="TRUE")).fetchall()
    merged = con.sql(
        f"""
        SELECT l_returnflag, bucket, MAX(m) AS m FROM (
            {_HLL_REG.format(src=SF, pred="l_partkey % 2 = 0")}
            UNION ALL
            {_HLL_REG.format(src=SF, pred="l_partkey % 2 = 1")}
        ) GROUP BY l_returnflag, bucket
        """
    ).fetchall()
    assert sorted(whole) == sorted(merged)


def test_hll_estimate_identical_after_merge(con):
    # the full derived frame (t_scaled, v_empty, estimate) from merged
    # shard registers equals the single-pass frame bit-for-bit
    def finish(reg_sql: str) -> list:
        return sorted(
            con.sql(
                f"""
                WITH reg AS ({reg_sql}),
                agg AS (
                    SELECT l_returnflag,
                           CAST(SUM(1::BIGINT << (25 - m)) AS BIGINT)
                               AS t_present,
                           CAST(COUNT(*) AS BIGINT) AS n_buckets
                    FROM reg GROUP BY l_returnflag
                )
                SELECT l_returnflag,
                       CAST(t_present + (256 - n_buckets) * 33554432
                            AS BIGINT) AS t_scaled,
                       (0.7213 / (1.0 + 1.079 / 256.0)) * 2199023255552.0
                           / (t_present + (256 - n_buckets) * 33554432)
                           AS est
                FROM agg
                """
            ).fetchall()
        )

    single = finish(_HLL_REG.format(src=SF, pred="TRUE"))
    merged = finish(
        f"""
        SELECT l_returnflag, bucket, MAX(m) AS m FROM (
            {_HLL_REG.format(src=SF, pred="l_partkey % 3 = 0")}
            UNION ALL
            {_HLL_REG.format(src=SF, pred="l_partkey % 3 <> 0")}
        ) GROUP BY l_returnflag, bucket
        """
    )
    assert single == merged


_HIST = """
    SELECT l_returnflag,
           LEAST(CAST(FLOOR(l_extendedprice / 128.0) AS BIGINT), 1023)
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM read_parquet('{src}/lineitem.parquet')
    WHERE {pred}
    GROUP BY 1, 2
"""


def test_histogram_merges_by_bucketwise_sum(con):
    whole = con.sql(_HIST.format(src=SF, pred="TRUE")).fetchall()
    merged = con.sql(
        f"""
        SELECT l_returnflag, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
            {_HIST.format(src=SF, pred="l_suppkey % 2 = 0")}
            UNION ALL
            {_HIST.format(src=SF, pred="l_suppkey % 2 = 1")}
        ) GROUP BY l_returnflag, bucket
        """
    ).fetchall()
    assert sorted(whole) == sorted(merged)


def test_histogram_quantile_error_bounded_by_bucket_width(con):
    # sketch contract: |approx - exact| <= 128 (one bucket width) for
    # every (flag, pct) — checked against DuckDB's exact inverse-CDF
    rows = con.sql(
        f"""
        WITH b AS ({_HIST.format(src=SF, pred="TRUE")}),
        c AS (
            SELECT l_returnflag, bucket, cnt,
                   SUM(cnt) OVER (PARTITION BY l_returnflag
                                  ORDER BY bucket) AS cum,
                   SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
            FROM b
        ),
        p AS (SELECT unnest([25, 50, 75, 95]) AS pct),
        hit AS (
            SELECT c.l_returnflag, p.pct, c.bucket, c.cnt, c.cum, c.n,
                   ROW_NUMBER() OVER (PARTITION BY c.l_returnflag, p.pct
                                      ORDER BY c.bucket) AS rn
            FROM c JOIN p ON 100 * c.cum >= p.pct * c.n
        ),
        approx AS (
            SELECT l_returnflag, pct,
                   (CAST(bucket * 128 AS BIGINT) * 1000000
                    + (((((pct * n + 99) // 100) - (cum - cnt)) * 128)
                       * 1000000) // cnt) / 1000000.0 AS a
            FROM hit WHERE rn = 1
        ),
        exact AS (
            SELECT l_returnflag,
                   quantile_disc(l_extendedprice, 0.25) AS e25,
                   quantile_disc(l_extendedprice, 0.50) AS e50,
                   quantile_disc(l_extendedprice, 0.75) AS e75,
                   quantile_disc(l_extendedprice, 0.95) AS e95
            FROM read_parquet('{SF}/lineitem.parquet')
            GROUP BY l_returnflag
        )
        SELECT ap.l_returnflag, ap.pct, ap.a,
               CASE ap.pct WHEN 25 THEN ex.e25 WHEN 50 THEN ex.e50
                           WHEN 75 THEN ex.e75 ELSE ex.e95 END AS e
        FROM approx ap JOIN exact ex USING (l_returnflag)
        """
    ).fetchall()
    assert len(rows) == 12
    for flag, pct, a, e in rows:
        assert abs(a - float(e)) <= 128.0, (flag, pct, a, e)


_CM_CELLS = r"""
    SELECT r, c, CAST(COUNT(*) AS BIGINT) AS cell
    FROM (
        SELECT u2.r AS r,
               CAST(('0x' || substr(md5(gram || '#' || CAST(u2.r AS VARCHAR)),
                                    1, 8))::UBIGINT % 256 AS BIGINT) AS c
        FROM (
            SELECT unnest([array_to_string(w[i:i+1], ' ')
                    FOR i IN range(1, GREATEST(len(w)-1, 1) + 1)]) AS gram
            FROM (SELECT doc_id,
                         regexp_split_to_array(trim(text), '\s+') AS w
                  FROM read_parquet('{src}/documents.parquet')
                  WHERE {pred})
        ), UNNEST([0, 1, 2, 3]) AS u2(r)
    )
    GROUP BY r, c
"""


def test_countmin_cells_merge_by_sum(con):
    """x130/s27's 100 TB property: count-min cells merge by bucket-wise
    SUM — sketching two arbitrary document shards and summing their
    cell tables is bit-identical to sketching the whole corpus (which
    is also why the streaming twin's complete-mode aggregate IS the
    batch sketch: every micro-batch is an associative cell merge)."""
    whole = con.sql(_CM_CELLS.format(src=SF, pred="TRUE")).fetchall()
    merged = con.sql(
        f"""
        SELECT r, c, SUM(cell) AS cell FROM (
            {_CM_CELLS.format(src=SF, pred="doc_id % 2 = 0")}
            UNION ALL
            {_CM_CELLS.format(src=SF, pred="doc_id % 2 = 1")}
        ) GROUP BY r, c
        """
    ).fetchall()
    assert sorted(whole) == sorted(merged)
    assert len(whole) > 0


def test_countmin_estimate_never_undercounts(con):
    """The count-min guarantee the entry's overestimate_ppm column
    rests on: min-of-cells ≥ exact count for EVERY gram, not just the
    reported top-30."""
    bad = con.sql(
        rf"""
        WITH freq AS (
            SELECT gram, CAST(COUNT(*) AS BIGINT) AS f FROM (
                SELECT unnest([array_to_string(w[i:i+1], ' ')
                        FOR i IN range(1, GREATEST(len(w)-1, 1) + 1)]) AS gram
                FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS w
                      FROM read_parquet('{SF}/documents.parquet'))
            ) GROUP BY gram
        ),
        hashed AS (
            SELECT gram, f, r,
                   CAST(('0x' || substr(md5(gram || '#' || CAST(r AS VARCHAR)),
                                        1, 8))::UBIGINT % 256 AS BIGINT) AS c
            FROM freq, UNNEST([0, 1, 2, 3]) AS t(r)
        ),
        sketch AS (SELECT r, c, CAST(SUM(f) AS BIGINT) AS cell
                   FROM hashed GROUP BY r, c),
        est AS (SELECT h.gram, h.f, MIN(s.cell) AS cm_est
                FROM hashed h JOIN sketch s ON s.r = h.r AND s.c = h.c
                GROUP BY h.gram, h.f)
        SELECT COUNT(*) FROM est WHERE cm_est < f
        """
    ).fetchone()[0]
    assert bad == 0


# ---------------------------------------------------------------------------
# Bloom filter (x131/x132/s28, round 12) — merge-by-OR, the one-sided
# error guarantee, and the lossless consumer prune
# ---------------------------------------------------------------------------


def _bloom_m_k():
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_sketch import (
        _BLOOM_K,
        _BLOOM_M,
    )

    return _BLOOM_M, _BLOOM_K


def test_bloom_words_merge_by_or(spark):
    """The shard-combine property the 100 TB story rests on:
    filter(A ∪ B) ≡ bit_or-merge(filter(A), filter(B)), word for
    word — so per-shard/per-day filters combine without re-scanning."""
    from pyspark.sql import functions as F

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.bloom import (
        bloom_merge,
        bloom_word_table,
    )

    m, k = _bloom_m_k()
    a = spark.createDataFrame([(f"key-a-{i}",) for i in range(40)], "fp string")
    b = spark.createDataFrame([(f"key-b-{i}",) for i in range(40)], "fp string")
    direct = {
        r["w"]: r["bits"]
        for r in bloom_word_table(a.unionAll(b), "fp", m, k).collect()
    }
    merged = {
        r["w"]: r["bits"]
        for r in bloom_merge(
            bloom_word_table(a, "fp", m, k), bloom_word_table(b, "fp", m, k)
        ).collect()
    }
    assert direct == merged and direct


def test_bloom_never_false_negative(spark, sf_dir):
    """The one-sided error guarantee x132's lossless prune rests on:
    EVERY inserted key must probe positive — over the real corpus
    fingerprints, not just synthetics."""
    from pyspark.sql import functions as F

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.bloom import (
        bloom_word_table,
        with_bloom_hit,
    )
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table

    m, k = _bloom_m_k()
    corp = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 != 0)
        .select(F.md5("text").alias("fp"))
        .distinct()
    )
    words = bloom_word_table(corp, "fp", m, k)
    probed = with_bloom_hit(corp, "fp", words, m, k)
    n = probed.count()
    assert n > 0
    assert probed.filter(F.col("bloom_hit") == 0).count() == 0


def test_bloom_pruned_dedup_equals_unpruned(spark, sf_dir):
    """VERDICT r11 item 5's 'done' bar: the Bloom-pruned incremental
    dedup must produce EXACTLY the unpruned x40 flags (the prune is
    lossless), while actually pruning a nonzero slice (the lever is
    exercised, not vacuous)."""
    from pyspark.sql import functions as F

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.dedup import (
        incremental_dedup_flags,
    )
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_sketch import (
        _BLOOM2_K,
        _BLOOM2_M,
    )
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    new_batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)

    def flags(**kw):
        return {
            r["doc_id"]: (r["dup_exact"], r["dup_near"])
            for r in incremental_dedup_flags(
                new_batch, corpus, id_col="doc_id", text_col="text",
                n=3, threshold=0.2, **kw
            ).collect()
        }

    plain = flags()
    pruned_df = incremental_dedup_flags(
        new_batch, corpus, id_col="doc_id", text_col="text",
        n=3, threshold=0.2, bloom_prune=(_BLOOM2_M, _BLOOM2_K),
    )
    pruned = {
        r["doc_id"]: (r["dup_exact"], r["dup_near"])
        for r in pruned_df.collect()
    }
    assert plain == pruned and plain
    n_pruned = pruned_df.filter(F.col("bloom_pruned")).count()
    assert n_pruned > 0, "the prune never fired — the lever is vacuous"
