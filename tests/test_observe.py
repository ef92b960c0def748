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


def test_stream_audit_metrics_ride_each_microbatch(spark, tmp_path):
    """with_stream_audit: per-micro-batch rows/violations must appear in
    the query's progress events — no second pass, no state."""
    from pyspark.sql import functions as F
    from data_pipelines_course_spark.plans.observe import with_stream_audit

    src = tmp_path / "obs_in"
    src.mkdir()
    (src / "f1.json").write_text("\n".join([
        '{"user_id": 1, "value": 5.0}',
        '{"user_id": 2, "value": -1.0}',   # violates value >= 0
        '{"user_id": 3, "value": 2.5}',
    ]) + "\n")
    stream = (spark.readStream
              .schema("user_id bigint, value double").json(str(src)))
    audited = with_stream_audit(
        stream, "ingest_audit",
        checks={"negative_value": F.col("value") < 0})
    q = (audited.writeStream.format("noop")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    progress = [p for p in q.recentProgress
                if p.get("observedMetrics", {}).get("ingest_audit")]
    q.stop()
    assert progress, "no observedMetrics in any progress event"
    m = progress[-1]["observedMetrics"]["ingest_audit"]
    assert m["rows"] == 3
    assert m["negative_value"] == 1
