"""Toy-scale streaming state-partition pin (VERDICT r8 item 5).

A streaming query binds its STATE partitioning to
``spark.sql.shuffle.partitions`` at first start, and every state
partition costs real per-micro-batch work: one task launch plus one
state-store instance with its commit files (a stream-stream join runs
FOUR store instances per partition). Under a plain session's default
200 partitions, s09/s10 spent 22-28 s each on ~220 KB of events —
pure store/scheduling overhead, 51 s of the round-8 full sweep.

Every test-scale drain (memory-sink AvailableNow adapters, the
stateful runners) wraps query START in :func:`pinned_state_partitions`
— default 8, env ``SPARK_GRAFT_STREAM_STATE_PARTITIONS`` — and
restores the session conf after. Results are partitioning-independent
(re-verified through the oracle gate for every wrapped entry).

Production makes the same decision at the same place: state partition
count is FIXED for a checkpoint's life, so it is a CREATE-TIME knob
sized to key cardinality and executor count, not a tuning knob
(docs/SCALE.md "Streaming state-partition sizing").
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

from pyspark.sql import SparkSession

# The pin mutates the SESSION-GLOBAL spark.sql.shuffle.partitions for
# the window's duration: any streaming query started concurrently on
# the shared session would bind its checkpoint-lifetime state
# partitioning to the toy value (ADVICE r9). In-process we ENFORCE the
# single-window assumption with a non-blocking lock — overlapping
# windows raise instead of silently cross-binding; cross-process
# sharing of one session is not a shape these test drains have.
_WINDOW = threading.Lock()


@contextmanager
def pinned_state_partitions(spark: SparkSession):
    raw = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8")
    try:
        n = int(raw)
        if n <= 0:
            raise ValueError
    except ValueError:
        raise ValueError(
            "SPARK_GRAFT_STREAM_STATE_PARTITIONS must be a positive "
            f"integer, got {raw!r}"
        ) from None
    if not _WINDOW.acquire(blocking=False):
        raise RuntimeError(
            "pinned_state_partitions windows must not overlap: a "
            "concurrently-started streaming query would bind its "
            "checkpoint-lifetime state partitioning to the pinned value"
        )
    try:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    finally:
        _WINDOW.release()
