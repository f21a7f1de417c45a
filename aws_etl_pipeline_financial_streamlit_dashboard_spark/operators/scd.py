"""SCD Type-2 merge — dimension history with effective-dated rows.

The reference's serving refresh is a full overwrite: yesterday's
company_info is gone after every load (TableTransform.py:26-29).
Financial analytics needs the opposite — "what did we believe about
this company in March" — which is slowly-changing-dimension type 2:
each key keeps a history of rows with ``[effective_from, effective_to)``
validity, the open row having ``effective_to = NULL``.

One equi-join + unions, no iteration, no MERGE statement dependency:

- unchanged keys keep their open row;
- changed keys: the open row closes at the update's effective date and
  a new open row appends;
- brand-new keys insert an open row;
- already-closed history rows pass through untouched.

Scale: the join is on the dimension key (broadcast when the update
batch is small — the usual case: daily changes ≪ dimension size), and
the closed-history passthrough never shuffles at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    eff_from: str = "effective_from",
    eff_to: str = "effective_to",
) -> DataFrame:
    """Apply ``updates`` (one row per key: ``key, *attrs, eff_from``)
    to an SCD2 ``history`` (``key, *attrs, eff_from, eff_to``).

    Attribute comparison is null-safe (``<=>``); a key appearing in
    ``updates`` with identical attrs is a no-op.
    """
    attrs = list(attrs)
    closed = history.filter(F.col(eff_to).isNotNull())
    open_rows = history.filter(F.col(eff_to).isNull())

    u = updates.select(
        F.col(key).alias("__u_key"),
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.col(eff_from).alias("__u_from"),
    )
    j = open_rows.join(u, open_rows[key] == F.col("__u_key"), "full_outer")

    same = F.lit(True)
    for a in attrs:
        same = same & (F.col(a).eqNullSafe(F.col(f"__u_{a}")))

    has_old = F.col(key).isNotNull()
    has_new = F.col("__u_key").isNotNull()

    # old open rows that survive: no update, or update with same attrs
    kept_open = j.filter(has_old & (~has_new | same)).select(
        key, *attrs, eff_from, eff_to
    )
    # old open rows closed by a real change
    newly_closed = j.filter(has_old & has_new & ~same).select(
        key, *attrs, eff_from, F.col("__u_from").alias(eff_to)
    )
    # new open rows: changed keys + brand-new keys
    new_open = j.filter(has_new & (~has_old | ~same)).select(
        F.col("__u_key").alias(key),
        *[F.col(f"__u_{a}").alias(a) for a in attrs],
        F.col("__u_from").alias(eff_from),
        F.lit(None).cast(history.schema[eff_to].dataType).alias(eff_to),
    )
    return closed.unionByName(kept_open).unionByName(newly_closed).unionByName(
        new_open
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    attrs: Sequence[str],
) -> DataFrame:
    """Change-data-capture diff between two snapshots of a keyed table:
    one row per changed key with ``action`` ∈ insert / update / delete.

    The CDC primitive every incremental pipeline needs when the source
    can only hand over full snapshots (the reference's daily full
    refresh, retrieval.py:142-146, is exactly that shape): diff today's
    snapshot against yesterday's and ship only the delta downstream.

    One full-outer NULL-SAFE equi-join (``<=>``) on the key; attribute
    comparison is also null-safe. Unchanged keys are dropped — the
    common case — so the output is delta-sized, not table-sized. At
    scale both snapshots shuffle on the key once; with both stored
    bucketed by the key the join is exchange-free (sources/bucketing).

    A NULL key is treated as a VALUE: a NULL-keyed row present in both
    snapshots diffs normally (unchanged → dropped, changed → update)
    instead of being mis-reported as a simultaneous insert + delete,
    which a plain ``=`` join would produce. Presence is tracked with
    explicit flags, not key-null-ness, so this holds. (Each snapshot
    should carry at most one NULL-keyed row — with several, the
    null-safe join pairs them all, as any keyed diff would for a
    duplicated key.)
    """
    attrs = list(attrs)
    o = old.select(
        F.col(key).alias("__o_key"),
        F.lit(True).alias("__o_present"),
        *[F.col(a).alias(f"__o_{a}") for a in attrs],
    )
    n = new.select(
        F.col(key).alias("__n_key"),
        F.lit(True).alias("__n_present"),
        *[F.col(a).alias(f"__n_{a}") for a in attrs],
    )
    j = o.join(n, o["__o_key"].eqNullSafe(n["__n_key"]), "full_outer")

    same = F.lit(True)
    for a in attrs:
        same = same & F.col(f"__o_{a}").eqNullSafe(F.col(f"__n_{a}"))

    has_old = F.col("__o_present").isNotNull()
    has_new = F.col("__n_present").isNotNull()
    action = (
        F.when(~has_old, F.lit("insert"))
        .when(~has_new, F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    return (
        j.withColumn("action", action)
        .filter(F.col("action").isNotNull())
        .select(
            F.coalesce("__n_key", "__o_key").alias(key),
            F.col("action"),
            *[F.col(f"__o_{a}").alias(f"old_{a}") for a in attrs],
            *[F.col(f"__n_{a}").alias(f"new_{a}") for a in attrs],
        )
    )
