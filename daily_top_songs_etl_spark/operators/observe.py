"""In-flight data-quality observation: metrics collected DURING the write.

The reference validates with CHECK constraints at insert time
(create_schema_behavior.sql) — the warehouse analogue at 100 TB cannot be
"write, then re-scan to validate": a second pass doubles the read. Spark's
``Observation``/``observe`` API accumulates aggregate metrics on the rows
as they flow through the already-running job, so validation costs zero
extra scans.

``checked_write`` attaches an observation, runs the caller's writer
action, then enforces threshold rules on the collected metrics — the
batch equivalent of a streaming data-quality monitor.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


class QualityViolation(RuntimeError):
    """A post-write quality rule failed; carries the observed metrics."""

    def __init__(self, failures: list[str], metrics: dict):
        super().__init__(f"quality rules failed: {failures}; metrics={metrics}")
        self.failures = failures
        self.metrics = metrics


def standard_metrics(value_col: str | None = None) -> list[Column]:
    """The default monitor set: row count (+ null count / min / max of an
    optional value column). All map-side accumulable aggregates."""
    out = [F.count(F.lit(1)).alias("n_rows")]
    if value_col:
        out += [
            F.sum(
                F.when(F.col(value_col).isNull(), 1).otherwise(0)
            ).alias("n_null_values"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        ]
    return out


def checked_write(
    df: DataFrame,
    writer: Callable[[DataFrame], None],
    metrics: list[Column],
    rules: dict[str, Callable[[dict], bool]],
) -> dict:
    """Run ``writer`` on ``df`` while observing ``metrics`` in-flight,
    then evaluate ``rules`` (name → predicate over the metric dict).

    Returns the observed metrics; raises :class:`QualityViolation` listing
    every failed rule. The metrics ride the write job itself — no second
    scan of the input.
    """
    obs = Observation()
    observed = df.observe(obs, *metrics)
    writer(observed)
    got = obs.get
    failures = [name for name, rule in rules.items() if not rule(got)]
    if failures:
        raise QualityViolation(failures, got)
    return got
