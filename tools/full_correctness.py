"""Regenerate CORRECTNESS_FULL_r{N}.json — the builder's full-catalog
mirror of the driver's correctness gate.

Protocol (same as the driver's, .claude/skills/verify/SKILL.md): a
plain SparkSession (no session.get_spark configs), every catalog
entry run at sf0.01, compared against DuckDB executing the entry's
oracle SQL on the same parquet views. Per entry: row count, sorted
column names, and a value comparison over rows normalized column-
name-sorted with floats at 10 significant digits. Oracle-less
entries record the weaker rows-only check (hash_match: null).

Usage:
    python tools/full_correctness.py OUT.json            # full catalog
    python tools/full_correctness.py OUT.json q75 x83    # update only
        entries whose name contains any of the given substrings,
        merging into OUT.json if it exists.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_rows(df) -> list[tuple[str, ...]]:
    df = df[sorted(df.columns)]
    out = []
    for r in df.itertuples(index=False):
        out.append(
            tuple(
                f"{v:.10g}" if isinstance(v, float) else str(v)
                for v in r
            )
        )
    return sorted(out)


def main() -> None:
    out_path = sys.argv[1]
    only = sys.argv[2:]

    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )

    qs, osql = E.queries(), E.oracle_sql()
    try:
        with open(out_path) as f:
            results = json.load(f)
    except FileNotFoundError:
        results = {}
    # prune records for renamed/removed entries so incremental updates
    # can never leave stale greens inflating the summary counts
    results = {k: v for k, v in results.items() if k in qs}

    names = [
        n for n in qs
        if not only or any(s in n for s in only)
    ]
    for i, name in enumerate(sorted(names)):
        rec = {
            "rows_match": False, "schema_match": False,
            "hash_match": None, "spark_rows": None,
            "oracle_rows": None, "err": None,
        }
        try:
            sp = qs[name](spark, SF).toPandas()
            rec["spark_rows"] = len(sp)
            if name in osql:
                du = con.sql(osql[name]).fetchdf()
                rec["oracle_rows"] = len(du)
                rec["rows_match"] = len(sp) == len(du)
                rec["schema_match"] = sorted(sp.columns) == sorted(du.columns)
                rec["hash_match"] = (
                    rec["schema_match"] and norm_rows(sp) == norm_rows(du)
                )
            else:
                # rows-only convention of the prior artifacts: no
                # oracle -> comparison fields None, err = "no_oracle"
                rec["rows_match"] = None
                rec["schema_match"] = None
                rec["err"] = "no_oracle"
        except Exception:
            rec["err"] = traceback.format_exc(limit=3)
        results[name] = rec
        status = "OK" if rec["hash_match"] else (
            "rows-only" if rec["err"] == "no_oracle" else "FAIL"
        )
        print(f"[{i + 1}/{len(names)}] {name}: {status}", flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    n_hash = sum(1 for r in results.values() if r["hash_match"] is True)
    n_rows = sum(1 for r in results.values() if r["err"] == "no_oracle")
    n_bad = len(results) - n_hash - n_rows
    print(f"total={len(results)} hash-green={n_hash} "
          f"rows-only={n_rows} bad={n_bad}")
    spark.stop()


if __name__ == "__main__":
    main()
