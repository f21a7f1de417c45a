"""Registry-wide non-vacuity net (VERDICT r8 item 2).

The two-scale non-empty probe is the repo's single best bug-finder
(caught q84/q92/q93's DuckDB-type bugs in r7 and q98's vacuous
half-gate in r8 — a predicate that matches NOTHING makes the oracle
diff a meaningless 0-vs-0 green). Until now it was applied per-batch by
hand when registering entries; this module generates it for EVERY
oracle-checkable entry in the live registry, so a new entry cannot skip
it and a testdata regeneration cannot silently hollow out a gate.

Why probing the ORACLE side alone is sufficient: the driver's
correctness gate separately pins spark row-count == oracle row-count
(and value-hash) per entry, so "oracle > 0 rows" + "gate green" implies
the Spark side is non-vacuous too — and a DuckDB-only sweep costs ~50 s
instead of a second full Spark sweep.

Rows-only entries (no oracle by design) are covered by
``test_rows_only_entries_nonempty_in_artifact`` against the committed
CORRECTNESS_FULL artifact.

Allowlists are DOCUMENTED, not silent: each exemption carries the
reason it is legitimately empty at that scale.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as E  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# entry -> reason it is LEGITIMATELY empty at that scale. Keep these
# rare: an entry empty at the driver's gate scale (sf0.01) would make
# its oracle diff vacuous, so EMPTY_OK_SF001 should stay empty unless a
# future entry's semantics genuinely produce an empty relation.
EMPTY_OK_SF001: dict[str, str] = {}
EMPTY_OK_SF0001: dict[str, str] = {
    "q30_not_exists_subquery": (
        "NOT EXISTS anti-join over ~150 customers x ~60 orders: at "
        "sf0.001 every customer in the probe segment has at least one "
        "qualifying order, so the anti set is genuinely empty; at the "
        "gate scale sf0.01 it returns rows and the oracle diff is "
        "non-vacuous (asserted below)."
    ),
}

ORACLES = E.oracle_sql()
QUERIES = E.queries()


def _con(sf: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/{sf}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def con_sf001():
    return _con("sf0.01")


@pytest.fixture(scope="module")
def con_sf0001():
    return _con("sf0.001")


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_nonempty_at_gate_scale(name: str, con_sf001):
    if name in EMPTY_OK_SF001:
        pytest.skip(f"documented empty-at-sf0.01: {EMPTY_OK_SF001[name]}")
    n = len(con_sf001.sql(ORACLES[name]).fetchall())
    assert n > 0, (
        f"{name}: oracle returns 0 rows at sf0.01 — the driver's "
        f"correctness diff for this entry is a vacuous 0-vs-0 match. "
        f"Fix the gate (a literal that does not exist in the data?) or "
        f"add a documented EMPTY_OK_SF001 reason."
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_nonempty_at_small_scale(name: str, con_sf0001):
    if name in EMPTY_OK_SF0001:
        pytest.skip(f"documented empty-at-sf0.001: {EMPTY_OK_SF0001[name]}")
    n = len(con_sf0001.sql(ORACLES[name]).fetchall())
    assert n > 0, (
        f"{name}: oracle returns 0 rows at sf0.001 — a literal-valued "
        f"gate that only accidentally matches at one scale? Probe the "
        f"predicate, or add a documented EMPTY_OK_SF0001 reason."
    )


def test_allowlists_reference_live_entries():
    for name in list(EMPTY_OK_SF001) + list(EMPTY_OK_SF0001):
        assert name in ORACLES, f"stale allowlist entry {name}"


def _latest_full_artifact() -> tuple[int, dict]:
    best_n, best = -1, None
    for p in REPO.glob("CORRECTNESS_FULL_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_FULL_r(\d+)\.json", p.name)
        if m and int(m.group(1)) > best_n:
            best_n, best = int(m.group(1)), p
    assert best is not None
    return best_n, json.loads(best.read_text())


def test_rows_only_entries_nonempty_in_artifact():
    """Rows-only entries have no oracle; pin their non-vacuity via the
    committed FULL artifact's recorded spark_rows (regenerated every
    round, so this cannot go stale past one round)."""
    _, full = _latest_full_artifact()
    rows_only = [n for n in QUERIES if n not in ORACLES]
    for name in rows_only:
        rec = full.get(name)
        if rec is None:
            continue  # registered this round, not yet in a FULL sweep
        assert rec.get("spark_rows", 0) > 0, (
            f"rows-only entry {name} recorded {rec.get('spark_rows')} "
            f"rows in the latest FULL artifact — its rows-only check "
            f"is vacuous"
        )
