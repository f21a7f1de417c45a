"""Pin s19's winner-independence (ADVICE r8 — which found a REAL bug).

s19 chains streaming exact dedup (``dropDuplicates`` keeps an
ARBITRARY arrival per key) into a per-``source`` rollup. Round 8
deduped on the fingerprint alone and argued winner-independence from
"no two documents with different source share identical text" — an
UNASSERTED data property that is in fact FALSE at sf0.1 (8 exact-
duplicate text groups span multiple sources), making the per-source
counts arrival-order-dependent there. Round 9 fix: the dedup key now
includes the rollup key — ``(source, fingerprint)`` in the query AND
``PARTITION BY source, md5(text)`` in the oracle — so the aggregates
are winner-independent by construction, for any data.

The pin: run the s19 oracle twice in DuckDB with OPPOSITE winner
orders (``ORDER BY doc_id`` vs ``doc_id DESC``) and assert identical
results — at sf0.1, where the cross-source duplicates live, this
FAILS if anyone reverts the dedup key to fingerprint-only; and
document the data fact the fix rests on.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_streaming import (
    _S19_ORACLE,
)

SCALES = [
    p for p in ("sf0.001", "sf0.01", "sf0.1")
    if Path(f"/root/testdata/{p}/documents.parquet").exists()
]


def _run(sf: str, sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('/root/testdata/{sf}/documents.parquet')"
    )
    return sorted(con.sql(sql).fetchall())


@pytest.mark.parametrize("sf", SCALES)
def test_s19_rollup_winner_independent(sf: str):
    asc = _S19_ORACLE
    marker = "ORDER BY doc_id)"
    assert marker in asc, "s19 oracle winner-order clause moved"
    desc = asc.replace(marker, "ORDER BY doc_id DESC)")
    assert _run(sf, asc) == _run(sf, desc), (
        f"{sf}: s19's rollup depends on WHICH duplicate survives — the "
        f"dedup key no longer covers the rollup's group-by columns"
    )


def test_cross_source_duplicates_exist_at_sf01():
    """The data fact that makes the sf0.1 leg of the test above a real
    pin (and made the round-8 fingerprint-only key a real bug): if a
    corpus regeneration removes every cross-source duplicate, the
    winner-independence test degrades to vacuous and this documents
    it."""
    if "sf0.1" not in SCALES:
        pytest.skip("sf0.1 not present")
    n = duckdb.sql(
        """
        SELECT COUNT(*) FROM (
            SELECT md5(text) AS fp
            FROM read_parquet('/root/testdata/sf0.1/documents.parquet')
            GROUP BY md5(text)
            HAVING COUNT(DISTINCT source) > 1
        )
        """
    ).fetchall()[0][0]
    assert n > 0, (
        "sf0.1 no longer holds cross-source exact duplicates — the "
        "winner-independence pin is now vacuous at every scale; find "
        "another adversarial fixture or note the change"
    )
