"""Zero-extra-pass data-quality metrics via Spark's Observation API.

The expectations family (spec.py / operators.analytics) VALIDATES with
dedicated queries; ``observe()`` instead piggybacks metric aggregates
onto a job that is already running — the right tool when a 100 TB load
cannot afford a second scan just to learn row counts and null rates.
Metrics are computed by the same tasks that execute the action and
collected driver-side as one tiny row; they never change the observed
plan's results.

Reference parity: the reference logs only row counts after the fact
(app.py:160-172); this is the in-flight generalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_quality_observation(
    df: DataFrame,
    name: str = "quality",
    null_cols: tuple[str, ...] = (),
    extra: dict[str, Column] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach an Observation computing row count, per-column null
    counts (for ``null_cols``) and any ``extra`` named aggregates.

    Returns the instrumented DataFrame (plan-identical results) and
    the Observation; read ``observation.get`` AFTER an action has run
    the plan. Metrics ride the action's own tasks — no second scan.
    """
    obs = Observation(name)
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}")
        )
    for alias, col in (extra or {}).items():
        metrics.append(col.alias(alias))
    return df.observe(obs, *metrics), obs
