"""HLL sketch accuracy + merge-consistency (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_course_spark.datasets import load
from data_pipelines_course_spark.queries import all_queries

from .conftest import SF_DIR


def test_sketch_estimates_within_tolerance(spark):
    rows = {r["event_type"]: r["approx_users"]
            for r in all_queries()["sketch_distinct_users_by_type"](
                spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events")
    exact = {r["event_type"]: r["n"]
             for r in ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert set(rows) == set(exact)
    for k, est in rows.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_union_of_slices_equals_direct_sketch(spark):
    """Merge-consistency — the 100 TB contract: sketching N slices and
    unioning them must estimate the same as sketching the whole table
    directly (identical sketch state, not merely close)."""
    ev = load(spark, SF_DIR, "events")
    direct = (ev.agg(F.hll_sketch_agg("user_id").alias("sk"))
              .select(F.hll_sketch_estimate("sk").alias("n"))
              .collect()[0]["n"])
    merged = (ev.groupBy("event_type")
              .agg(F.hll_sketch_agg("user_id").alias("sk"))
              .agg(F.hll_union_agg("sk").alias("sk"))
              .select(F.hll_sketch_estimate("sk").alias("n"))
              .collect()[0]["n"])
    assert merged == direct
