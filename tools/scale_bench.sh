#!/bin/sh
# Reproduce the cross-scale crossover measurement (docs/PERF.md "The
# scale crossover, measured") in one command:
#   sh tools/scale_bench.sh
# Generates testdata/sf1 and testdata/sf10 if absent (deterministic
# key-shifted replication of the driver's sf0.1 — tools/gen_sf.py),
# then runs the identical steady-state protocol for BOTH engines at
# each scale, Spark (bench.py) and DuckDB (tools/duck_headline.py)
# back-to-back in the same window so page-cache and container-noise
# conditions are shared. Output: BENCH_local_sf*.json / DUCK_sf*.json
# in the repo root (one JSON line each).
set -e
cd "$(dirname "$0")/.."

[ -d testdata/sf1 ] || python tools/gen_sf.py
[ -d testdata/sf10 ] || python tools/gen_sf.py --factor 100 --out testdata/sf10

# sleep between windows: the previous window's JVM shutdown tail
# (reparented to init once python exits) reads as FOREIGN CPU in the
# next window's contention telemetry and can trip a spurious retry
python bench.py 2>/dev/null | tee BENCH_local_sf0.1.json
sleep 10
python tools/duck_headline.py | tee DUCK_sf0.1.json
sleep 10

SPARK_GRAFT_SF_DIR="$PWD/testdata/sf1" python bench.py 2>/dev/null \
    | tee BENCH_local_sf1.json
sleep 10
SPARK_GRAFT_SF_DIR="$PWD/testdata/sf1" python tools/duck_headline.py \
    | tee DUCK_sf1.json
sleep 10

# split-scan mode off at sf10: the generated layout already has ~46
# row groups per fact file, so the re-layout experiment is moot there
SPARK_GRAFT_SF_DIR="$PWD/testdata/sf10" SPARK_GRAFT_BENCH_SPLIT=0 \
    python bench.py 2>/dev/null | tee BENCH_local_sf10.json
sleep 10
SPARK_GRAFT_SF_DIR="$PWD/testdata/sf10" python tools/duck_headline.py \
    | tee DUCK_sf10.json
