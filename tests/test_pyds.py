"""Python DataSource API exemplar (sources/pyds.py): schema, partition
parallelism, determinism, and composition with relational operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_course_spark.sources import pyds


def _read(spark, **opts):
    pyds.register(spark)
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_schema_and_row_count(spark):
    df = _read(spark, rows_per_partition=100, partitions=4, seed=7)
    assert df.columns == ["event_id", "ts", "user_id", "event_type",
                          "value"]
    assert df.count() == 400


def test_partition_option_drives_task_parallelism(spark):
    df = _read(spark, rows_per_partition=10, partitions=8)
    assert df.rdd.getNumPartitions() == 8


def test_deterministic_rows(spark):
    a = _read(spark, rows_per_partition=50, partitions=2, seed=42)
    b = _read(spark, rows_per_partition=50, partitions=2, seed=42)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    c = _read(spark, rows_per_partition=50, partitions=2, seed=43)
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))


def test_composes_with_relational_operators(spark):
    df = _read(spark, rows_per_partition=200, partitions=4, seed=1)
    agg = (df.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("total")))
    rows = {r["event_type"]: r["n"] for r in agg.collect()}
    assert sum(rows.values()) == 800
    assert set(rows) <= {"view", "click", "purchase", "signup", "error"}
