#!/usr/bin/env python
"""Scale-up generator: replicate the driver's sf0.1 testdata K times
with deterministic key remapping, producing a larger scale factor with
IDENTICAL schema and join selectivity.

Purpose (VERDICT r5 item 1): measure the Spark-vs-DuckDB headline
ratio at sf1 to convert the harness-floor argument into a measured
scale crossover. The driver's own generator is not available, so sf1
is derived from its sf0.1 output: each fact/dim table is replicated
``--factor`` times, replica ``r`` shifting every key column by
``r * base`` where ``base`` = (max source key + 1) for the table that
OWNS the key. Foreign keys shift by the owner's base, so every join
matches exactly as at sf0.1 (each replica joins only within itself)
and group-by value distributions are preserved. region/nation stay
fixed (TPC-H semantics: dimension vocabularies don't grow with SF).

Determinism: pure arithmetic on the source rows — no RNG — so two runs
produce byte-identical tables and the Spark/DuckDB comparison runs on
the same files.

Layout: ~64 row groups per table (floor 8192 rows — the realistic
warehouse layout both engines split by; a fixed 131072 left the 200k-row
embeddings table at TWO groups, capping both engines' scan parallelism
at 2 — the driver's one-row-group-per-file sf0.1 layout is the
degenerate case bench.py's split-scan mode already isolates).

Usage:
    python tools/gen_sf.py [--src /root/testdata/sf0.1] \
        [--out testdata/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key column -> owning key space (tables sharing a space shift together)
KEYED: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
# key space -> (table, column) whose max defines the replica offset
OWNER: dict[str, tuple[str, str]] = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}
COPIED = ("region", "nation")
# Per-table row-group sizing (round 9): the old fixed 131072 was right
# for lineitem (~46 groups at sf1) but left the 200k-row embeddings
# table with TWO row groups — and both Spark and DuckDB parallelize a
# parquet scan by row group, so every embeddings-heavy entry ran its
# brute-force cosine stages on 2 cores of 32 (the x107/x108 sf10 A/B
# hang). A 100 TB table has thousands of groups; the toy file must
# too. ~64 groups per table (floor 8192 rows so tiny tables don't
# fragment) keeps 2 waves of tasks on 32 cores for every table.
ROW_GROUP_TARGET_SPLITS = 64
ROW_GROUP_MIN = 8192


def _row_group_size(n_rows: int) -> int:
    return max(ROW_GROUP_MIN, -(-n_rows // ROW_GROUP_TARGET_SPLITS))


def generate(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    bases: dict[str, int] = {}
    for space, (tbl, col) in OWNER.items():
        t = pq.read_table(os.path.join(src, f"{tbl}.parquet"), columns=[col])
        bases[space] = int(pc.max(t.column(col)).as_py()) + 1

    for name in COPIED:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows (copied)")

    for name, keymap in KEYED.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        replicas = []
        for r in range(factor):
            if r == 0:
                replicas.append(t)
                continue
            cols = {}
            for field in t.schema.names:
                col = t.column(field)
                space = keymap.get(field)
                if space is not None:
                    col = pc.add(col, pa.scalar(r * bases[space], type=pa.int64()))
                    col = col.cast(t.schema.field(field).type)
                cols[field] = col
            replicas.append(pa.table(cols, schema=t.schema))
        big = pa.concat_tables(replicas)
        rg = _row_group_size(big.num_rows)
        pq.write_table(
            big, os.path.join(out, f"{name}.parquet"), row_group_size=rg
        )
        print(f"{name}: {t.num_rows} -> {big.num_rows} rows (rg={rg})")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata", "sf1"),
    )
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    generate(args.src, args.out, args.factor)


if __name__ == "__main__":
    main()
