"""Zero-cost data-quality monitors via ``Observation``/``observe``.

The reference's quality story is a README claim of manual backfill with
no code (README.md:28; SURVEY.md §2.2 P7). The Spark-native mechanism:
``df.observe`` attaches aggregate metrics to a plan that are computed
DURING the action already running — no second scan, no extra job — and
surfaced to the driver afterwards. At 100 TB a separate validation pass
re-reads the lake; observed metrics are free.

Usage::

    df, obs = with_quality_metrics(df, "serving_load",
                                   null_cols=["ebitda", "net_income"])
    df.write.parquet(path)            # the action computes the metrics
    report = quality_report(obs, rows_min=1)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_quality_metrics(
    df: DataFrame,
    name: str,
    null_cols: Sequence[str] = (),
    bounds: dict[str, tuple[float, float]] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach row-count, per-column null-count, and min/max range
    metrics to ``df``'s next action."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls__{c}")
        )
    for c in (bounds or {}):
        metrics.append(F.min(c).alias(f"min__{c}"))
        metrics.append(F.max(c).alias(f"max__{c}"))
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def quality_report(
    obs: Observation,
    rows_min: int = 1,
    max_null_fraction: float = 1.0,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> dict:
    """Evaluate the observed metrics against thresholds. Returns
    ``{"metrics": {...}, "violations": [...]}`` — callers decide
    whether violations fail the pipeline or page someone."""
    m = obs.get
    violations: list[str] = []
    n = m.get("n_rows", 0)
    if n < rows_min:
        violations.append(f"n_rows={n} < {rows_min}")
    for k, v in m.items():
        if k.startswith("nulls__") and n:
            frac = v / n
            if frac > max_null_fraction:
                violations.append(f"{k[7:]}: null fraction {frac:.3f} > {max_null_fraction}")
    for c, (lo, hi) in (bounds or {}).items():
        mn, mx = m.get(f"min__{c}"), m.get(f"max__{c}")
        if mn is not None and mn < lo:
            violations.append(f"{c}: min {mn} < {lo}")
        if mx is not None and mx > hi:
            violations.append(f"{c}: max {mx} > {hi}")
    return {"metrics": dict(m), "violations": violations}
