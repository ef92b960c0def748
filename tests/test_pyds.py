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


def test_streaming_python_datasource_offsets_resume_exactly_once(
        spark, tmp_path):
    """The streaming DataSource must (a) deliver rows_per_batch * parts
    rows per availableNow drain and (b) resume from the COMMITTED offset
    on a restarted query sharing the checkpoint — no duplicate, no gap
    (every event_id distinct across both drains)."""
    from data_pipelines_course_spark.sources import pyds

    pyds.register(spark)
    out = str(tmp_path / "pyds_out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = (spark.readStream.format("synthetic_events")
                  .option("rows_per_batch", 50)
                  .option("partitions", 2)
                  .option("seed", 7).load())
        q = (stream.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        q.stop()

    drain()
    first = spark.read.parquet(out).count()
    assert first == 50 * 2
    drain()  # restart from checkpoint: next 50 offsets per partition
    rows = spark.read.parquet(out)
    assert rows.count() == 200
    assert rows.select("event_id").distinct().count() == 200  # no dupes
    # determinism: offsets 0-49 of partition 0 equal the batch reader's
    batch = (spark.read.format("synthetic_events")
             .option("rows_per_partition", 50)
             .option("partitions", 1)
             .option("seed", 7).load())
    a = sorted(r["event_id"] for r in batch.collect())
    b = sorted(r["event_id"] for r in
               rows.filter("event_id < 1000000 and event_id % 1000000 < 50")
               .filter("event_id < 50").collect())
    assert b == a[:len(b)]
