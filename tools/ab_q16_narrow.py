#!/usr/bin/env python
"""A/B: q16's eager-rollup exchange payload — hi/lo split (32 B/row:
orderkey, rev_hi, rev_lo, n_li) vs a single packed int64 micros column
(24 B/row: orderkey, rev_mic, n_li), widening back to hi/lo AFTER the
join (VERDICT r6 item 7). Same protocol as bench.py (2 warm-up + N
timed passes, min + median), same session, results value-checked equal
before timing. Run against sf10 where the exchange dominates:

    SPARK_GRAFT_SF_DIR=$PWD/testdata/sf10 python tools/ab_q16_narrow.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans import catalog as C  # noqa: E402
from aws_etl_pipeline_financial_streamlit_dashboard_spark.session import get_spark  # noqa: E402

# the packed variant: ONE bigint micros column through the exchange.
# rev_mic = hi·10⁶ + lo is exact (both parts non-negative integers);
# the final aggregate splits AFTER the integer sum (div/% — the sum
# stays integer-exact; a direct CAST(SUM(rev_mic) AS DOUBLE) would
# round past 2⁵³). Headroom note: per-order rev_mic < ~10¹² so the
# per-group SUM holds to ~10⁶ orders/group per 2⁶³ — fine at sf10,
# but the hi/lo split's headroom is 10⁶× larger, which is why it is
# the shipped form unless the narrow payload pays measurably.
_Q16_NARROW_SQL = f"""
    WITH ord_rev AS (
        SELECT l_orderkey,
               SUM(CAST(FLOOR({C._Q16_E}) AS BIGINT)) * 1000000
                 + SUM(CAST(FLOOR(({C._Q16_E} - FLOOR({C._Q16_E}))
                       * 1000000.0 + 0.5) AS BIGINT)) AS rev_mic,
               COUNT(*) AS n_li
        FROM sg_lineitem GROUP BY l_orderkey
    ),
    {C._Q16_CUST_REGION}
    SELECT /*+ SHUFFLE_HASH(o), BROADCAST(cr) */
           cr.r_name AS region_name,
           date_format(o.o_orderdate, 'yyyy') AS order_year,
           CAST(FLOOR((CAST(SUM(rev_mic) div 1000000 AS DOUBLE)
                 + CAST(SUM(rev_mic) % 1000000 AS DOUBLE) / 1000000.0)
                 * 100.0 + 0.5) / 100.0 AS DOUBLE) AS revenue,
           SUM(n_li) AS n_lineitems
    FROM ord_rev v
    JOIN sg_orders o ON v.l_orderkey = o.o_orderkey
    JOIN cust_region cr ON o.o_custkey = cr.c_custkey
    GROUP BY cr.r_name, date_format(o.o_orderdate, 'yyyy')
"""


def main() -> None:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", os.path.join(REPO_ROOT, "testdata", "sf10")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = max(3, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    import bench

    total_bytes = bench._input_bytes(sf_dir)
    spark = get_spark(
        app_name="ab_q16",
        master=f"local[{cpus}]",
        shuffle_partitions=bench._shuffle_partitions(total_bytes, cpus),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def baseline():
        return C.QUERIES["q16_star_join_revenue"].spark(spark, sf_dir)

    def narrow():
        C._sgv(spark, sf_dir)
        return spark.sql(_Q16_NARROW_SQL)

    # value check FIRST — a faster wrong answer is not a result
    a = sorted(map(tuple, baseline().collect()))
    b = sorted(map(tuple, narrow().collect()))
    assert a == b, "narrow variant changed the result"

    out: dict = {"sf_dir": sf_dir, "reps": reps, "values_equal": True}
    for name, fn in (("baseline_hi_lo", baseline), ("narrow_packed", narrow)):
        for _ in range(2):
            fn().collect()
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().collect()
            runs.append(time.perf_counter() - t0)
        out[name] = {
            "min_sec": round(min(runs), 4),
            "median_sec": round(statistics.median(runs), 4),
            "band_sec": [round(min(runs), 4), round(max(runs), 4)],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
