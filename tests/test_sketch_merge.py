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
