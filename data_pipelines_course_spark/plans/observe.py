"""In-flight data-quality audit via `DataFrame.observe` — row counts and
rule violations measured ON the running job, not by a second pass.

The reference's pipelines validate by re-reading what they just wrote
(luigi `output().exists()` targets, celery result checks); at 100 TB a
second validation scan doubles the bill. Spark's Observation API attaches
aggregate metrics to a point in the plan and collects them as a side
effect of the action that was running anyway — zero extra scans, exact
(unlike accumulator task-retry double-counting), and available for both
batch (`Observation`) and streaming (named `observe` + progress events).

Typical use::

    audited, obs = with_audit(df, checks={"null_key": F.col("k").isNull()})
    audited.write.parquet(path)          # the job itself measures
    stats = obs.get                      # {'rows': ..., 'null_key': ...}
    assert stats["null_key"] == 0
"""

from __future__ import annotations

from typing import Mapping, Tuple

from pyspark.sql import Column, DataFrame, Observation, functions as F

__all__ = ["with_audit", "audit_violations", "with_stream_audit"]


def with_audit(df: DataFrame,
               checks: Mapping[str, Column] | None = None,
               ) -> Tuple[DataFrame, Observation]:
    """Attach an Observation measuring total rows plus one violation
    counter per named boolean predicate (True = the row violates the
    rule). Returns (audited_df, observation); run any action on
    audited_df, then read `observation.get`.

    The metrics are computed as map-side partial aggregates merged on
    the driver — no shuffle, no extra pass, and they observe the rows
    at THIS point of the plan (post-filter counts differ from scan
    counts, which is exactly what a pipeline audit wants)."""
    checks = dict(checks or {})
    metrics = [F.count(F.lit(1)).alias("rows")]
    for name, predicate in checks.items():
        metrics.append(
            F.sum(F.when(predicate, 1).otherwise(0)).alias(name))
    obs = Observation()
    return df.observe(obs, *metrics), obs


def audit_violations(stats: Mapping[str, int]) -> dict[str, int]:
    """The non-zero violation counters from an Observation result —
    empty dict means every rule passed."""
    return {k: int(v) for k, v in stats.items()
            if k != "rows" and v not in (0, None)}


def with_stream_audit(df: DataFrame, name: str,
                      checks: Mapping[str, Column] | None = None,
                      ) -> DataFrame:
    """Streaming twin of with_audit: attach NAMED observe metrics to a
    streaming DataFrame — per-micro-batch row and violation counts
    surface in every StreamingQueryProgress under
    `progress.observedMetrics[name]`, measured on the micro-batch that
    was running anyway (same zero-extra-pass contract as batch; the
    `Observation` handle object is batch-only, so streaming uses the
    name-string form and reads results from progress events)."""
    checks = dict(checks or {})
    metrics = [F.count(F.lit(1)).alias("rows")]
    for metric_name, predicate in checks.items():
        metrics.append(
            F.sum(F.when(predicate, 1).otherwise(0)).alias(metric_name))
    return df.observe(name, *metrics)
