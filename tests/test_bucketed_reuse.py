"""Cross-session bucketed-table reuse (round 10).

The old build dance dropped + rewrote the warehouse dir in every new
session, which let a second process clobber part files out from under
a first process mid-scan (observed as FAILED_READ_FILE) and repaid
the write-time shuffle per run. The reuse contract: a finished layout
carries a ``_SPARK_GRAFT_BUCKETS_OK`` marker (bucket spec + source
file signature); a session with no catalog entry for the table
registers an EXTERNAL bucketed table over the existing files instead
of rebuilding; a marker MISMATCH (spec or source changed) rebuilds.

These tests drive ``_ensure_bucketed_table`` directly against
synthetic warehouse state — the in-process equivalent of a fresh
session finding the previous process's layout on disk.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_more import (
    _ensure_bucketed_table,
)


def _part_state(loc):
    return sorted(
        (f, os.path.getmtime(os.path.join(loc, f)))
        for f in os.listdir(loc)
        if f.startswith("part-")
    )


def _wh(spark):
    wh = spark.conf.get("spark.sql.warehouse.dir")
    return wh[len("file:"):] if wh.startswith("file:") else wh


def test_marker_match_reuses_without_rewrite(spark, sf_dir):
    """A finished layout + matching marker → external registration,
    part files byte-untouched, bucketed-join plan still exchange-free
    on the table's side."""
    wh_path = _wh(spark)
    name = "t_reuse_probe"
    built = "t_reuse_probe_built"
    for t in (name, built):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh_path, t), ignore_errors=True)

    # build once (the "previous process")
    _ensure_bucketed_table(
        spark, wh_path, sf_dir, built, "orders",
        ["o_orderkey", "o_custkey"], ["o_orderkey"], 8,
    )
    loc_built = os.path.join(wh_path, built)
    # simulate the fresh-session view of that layout under a new name:
    # same files + marker, no catalog entry
    loc = os.path.join(wh_path, name)
    shutil.copytree(loc_built, loc)
    marker = json.load(open(os.path.join(loc, "_SPARK_GRAFT_BUCKETS_OK")))
    before = _part_state(loc)

    _ensure_bucketed_table(
        spark, wh_path, sf_dir, name, "orders",
        ["o_orderkey", "o_custkey"], ["o_orderkey"], 8,
    )
    assert spark.catalog.tableExists(name)
    assert _part_state(loc) == before, "reuse path rewrote the files"
    # registered table carries the bucket spec: scan side plans without
    # an exchange when grouped on the bucket key
    plan = (
        spark.table(name)
        .groupBy("o_orderkey")
        .agg(F.count("*"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    # and the data is complete
    import pyspark.sql.functions as _F

    n_src = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).count()
    )
    assert spark.table(name).count() == n_src
    # cleanup (external drop keeps files; remove explicitly)
    for t in (name, built):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh_path, t), ignore_errors=True)


def test_marker_mismatch_rebuilds(spark, sf_dir):
    """A stale marker (different spec) must NOT be reused — the layout
    is rebuilt and the marker restamped with the current spec."""
    wh_path = _wh(spark)
    name = "t_reuse_stale"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = os.path.join(wh_path, name)
    shutil.rmtree(loc, ignore_errors=True)

    _ensure_bucketed_table(
        spark, wh_path, sf_dir, name, "orders",
        ["o_orderkey", "o_custkey"], ["o_orderkey"], 8,
    )
    # corrupt the marker to claim a different bucket count
    mpath = os.path.join(loc, "_SPARK_GRAFT_BUCKETS_OK")
    stale = json.load(open(mpath))
    stale["n_buckets"] = 4
    json.dump(stale, open(mpath, "w"))
    # drop the catalog entry so ensure takes the on-disk path
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    if not os.path.isdir(loc):  # managed drop removed files: rebuild seed
        _ensure_bucketed_table(
            spark, wh_path, sf_dir, name, "orders",
            ["o_orderkey", "o_custkey"], ["o_orderkey"], 8,
        )
        json.dump(stale, open(mpath, "w"))
        spark.sql(f"DROP TABLE IF EXISTS {name}")

    before = _part_state(loc) if os.path.isdir(loc) else []
    _ensure_bucketed_table(
        spark, wh_path, sf_dir, name, "orders",
        ["o_orderkey", "o_custkey"], ["o_orderkey"], 8,
    )
    assert spark.catalog.tableExists(name)
    got = json.load(open(mpath))
    assert got["n_buckets"] == 8, "marker not restamped after rebuild"
    assert _part_state(loc) != before, "stale layout was reused"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(loc, ignore_errors=True)


def test_same_size_regenerated_source_rebuilds(spark, sf_dir, tmp_path):
    """ADVICE r10: regenerated testdata whose part files keep identical
    names AND byte sizes must still invalidate the marker — the
    signature carries mtime_ns, so a content rewrite (same bytes, new
    write) forces a rebuild instead of silently reusing a stale
    layout built from the old content. (Under the old (name, size)
    signature this test reuses the stale layout and fails.)"""
    wh_path = _wh(spark)
    name = "t_reuse_regen"
    built = "t_reuse_regen_built"
    for t in (name, built):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh_path, t), ignore_errors=True)

    # private copy of the source so we can "regenerate" it
    my_sf = tmp_path / "sf"
    my_sf.mkdir()
    src = os.path.join(sf_dir, "orders.parquet")
    dst = str(my_sf / "orders.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copyfile)(src, dst)

    # build once (the "previous process"), then stage the fresh-session
    # view under a new name: files + marker on disk, no catalog entry
    _ensure_bucketed_table(
        spark, wh_path, str(my_sf), built, "orders",
        ["o_orderkey", "o_custkey"], ["o_orderkey"], 8,
    )
    loc = os.path.join(wh_path, name)
    shutil.copytree(os.path.join(wh_path, built), loc)
    before = _part_state(loc)

    # "regenerate": rewrite every source file with its own bytes —
    # names and sizes unchanged, mtime necessarily newer
    targets = (
        [os.path.join(r, f) for r, _, fs in os.walk(dst) for f in fs]
        if os.path.isdir(dst)
        else [dst]
    )
    for p in targets:
        data = open(p, "rb").read()
        open(p, "wb").write(data)

    _ensure_bucketed_table(
        spark, wh_path, str(my_sf), name, "orders",
        ["o_orderkey", "o_custkey"], ["o_orderkey"], 8,
    )
    assert spark.catalog.tableExists(name)
    assert _part_state(loc) != before, (
        "same-name same-size regenerated source reused a stale layout"
    )
    for t in (name, built):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh_path, t), ignore_errors=True)
