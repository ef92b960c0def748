"""Observation-audit tests (plans/observe.py): metrics ride the job."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_course_spark.datasets import load
from data_pipelines_course_spark.plans.observe import (audit_violations,
                                                       with_audit)

from .conftest import SF_DIR


def test_audit_measures_without_extra_pass(spark, tmp_path):
    """One write action yields both the sink output and the audit
    metrics — rows seen at the observe point, violations counted."""
    ev = load(spark, SF_DIR, "events").filter(F.col("value") > 0)
    audited, obs = with_audit(ev, checks={
        "null_user": F.col("user_id").isNull(),
        "nonpositive_value": F.col("value") <= 0,
    })
    audited.write.mode("overwrite").parquet(str(tmp_path / "out"))
    stats = obs.get
    assert stats["rows"] == ev.count()
    assert stats["nonpositive_value"] == 0      # filtered upstream
    assert audit_violations(stats) in ({}, {"null_user": stats["null_user"]})


def test_audit_detects_planted_violation(spark):
    df = spark.range(10).withColumn(
        "v", F.when(F.col("id") < 3, None).otherwise(F.col("id")))
    audited, obs = with_audit(df, checks={"null_v": F.col("v").isNull()})
    assert audited.count() == 10
    assert obs.get["null_v"] == 3
    assert audit_violations(obs.get) == {"null_v": 3}
