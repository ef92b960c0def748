"""Skew-handling operators: salted joins and two-stage aggregation.

The oracle-parity of the two registered queries is covered by
test_parity.py; these tests pin the properties parity can't see:
(1) equivalence to the plain shapes with broadcast DISABLED, i.e. on
the shuffled path where the rewrite actually matters, and (2) that the
salt really spreads a hot key across partitions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipelines_course_spark.datasets import load
from data_pipelines_course_spark.operators.skew import (
    row_salt, salted_join, two_stage_agg)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_join_matches_plain_join(no_broadcast):
    spark = no_broadcast
    orders = load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
    salted = salted_join(orders, cust, "o_custkey", "c_custkey",
                         n=8, salt_unique_col="o_orderkey")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain.select(*salted.columns)).count() == 0


def test_salted_left_join_keeps_unmatched(no_broadcast):
    spark = no_broadcast
    left = spark.createDataFrame(
        [(i, i % 3) for i in range(30)] + [(100, 99)], ["id", "k"])
    right = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], ["k2", "v"])
    out = salted_join(left, right, "k", "k2", n=4,
                      salt_unique_col="id", how="left")
    assert out.count() == 31
    assert out.filter(F.col("v").isNull()).count() == 1


def test_two_stage_agg_matches_plain_agg(spark):
    ev = load(spark, SF_DIR, "events")
    plain = (ev.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"), F.min("value").alias("mn"),
                  F.max("value").alias("mx"))
             .orderBy("event_type").collect())
    salted = two_stage_agg(
        ev, ["event_type"],
        partial=[F.count(F.lit(1)).alias("_c"), F.min("value").alias("_mn"),
                 F.max("value").alias("_mx")],
        final=[F.sum("_c").alias("n"), F.min("_mn").alias("mn"),
               F.max("_mx").alias("mx")],
        salt_unique_col="event_id",
    ).orderBy("event_type").collect()
    assert [r.asDict() for r in salted] == [r.asDict() for r in plain]


def test_salt_spreads_hot_key(spark):
    # One single hot key; the salt must fan its rows out close to
    # uniformly over n buckets (xxhash64 of the row-unique column).
    n = 16
    df = (spark.range(16_000)
          .withColumn("k", F.lit("hot"))
          .withColumn("salt", row_salt(n, unique_col="id")))
    counts = [r["count"] for r in df.groupBy("salt").count().collect()]
    assert len(counts) == n
    assert max(counts) < 2 * min(counts)


def test_row_salt_deterministic(spark):
    df = spark.range(100).withColumn("s", row_salt(8, unique_col="id"))
    a = [r.s for r in df.orderBy("id").collect()]
    b = [r.s for r in df.orderBy("id").collect()]
    assert a == b
    assert set(a) <= set(range(8))


def test_aqe_splits_skewed_join_partition_at_runtime(spark):
    """Runtime proof of the session's skew-join posture (session.py
    enables spark.sql.adaptive.skewJoin): under a 99%-hot-key join with
    broadcast disabled, AQE must re-plan the sort-merge join with
    skew=true (the hot partition split across tasks) in the FINAL
    adaptive plan — the automatic complement to the explicit salting
    operators this module tests. The final plan is only observable on
    the collected DataFrame's own queryExecution (count()/noop spawn a
    fresh execution that never finalizes this one — measured while
    building this test)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 500_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(0))
            .otherwise(F.col("id")).alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"))
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.lit("dim").alias("d"))
        j = left.join(right, "k")
        rows = j.collect()
        assert len(rows) == 495_010  # 495k hot-key + 1.01k tail matches
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
