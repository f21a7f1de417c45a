"""pinned_state_partitions guards (ADVICE r9): the toy-scale state
pin mutates session-global spark.sql.shuffle.partitions for its
window, so (1) a malformed env override must fail AT ENTRY, before
any conf is touched, and (2) overlapping windows must raise rather
than silently bind a concurrent query's checkpoint-lifetime state
partitioning to the pinned value.
"""

from __future__ import annotations

import pytest

from aws_etl_pipeline_financial_streamlit_dashboard_spark.streaming.stateconf import (
    pinned_state_partitions,
)


@pytest.mark.parametrize("bad", ["eight", "", "-4", "0", "8.5"])
def test_rejects_non_positive_int_env(spark, monkeypatch, bad):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_PARTITIONS", bad)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(ValueError, match="positive"):
        with pinned_state_partitions(spark):
            pass  # pragma: no cover — must not be reached
    # the conf was never touched (validation happens before the set)
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_overlapping_windows_raise(spark, monkeypatch):
    # pin the default explicitly so an ambient env override cannot
    # change the value the inner-failure assertion expects (ADVICE r10)
    monkeypatch.delenv("SPARK_GRAFT_STREAM_STATE_PARTITIONS", raising=False)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with pinned_state_partitions(spark):
        with pytest.raises(RuntimeError, match="overlap"):
            with pinned_state_partitions(spark):
                pass  # pragma: no cover
        # the inner failure must not have broken the outer window
        assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_window_pins_and_restores(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "6")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with pinned_state_partitions(spark):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "6"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
