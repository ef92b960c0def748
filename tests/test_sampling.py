"""Sampling-layer tests: bucket-domain and cross-engine properties that
the row-level oracle parity (tests/test_parity.py) can't express, in the
reference's Hypothesis style (SURVEY §5.2 item 3).

The load-bearing property is ENGINE PORTABILITY: hash_bucket(key) must
equal DuckDB's bucket for the same key — that is what makes a sample
reproducible outside Spark (and oracle-checkable). Hypothesis drives
arbitrary keys through both engines in one batched DataFrame per example
set."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_pipelines_course_spark.operators.sampling import (
    hash_bucket,
    mixture_sample,
    train_eval_split,
)

KEYS = st.lists(st.integers(min_value=-2**62, max_value=2**62),
                min_size=1, max_size=50, unique=True)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(keys=KEYS)
def test_hash_bucket_matches_duckdb(spark, duck, keys):
    spark_buckets = {
        r["k"]: r["b"]
        for r in spark.createDataFrame([(k,) for k in keys], "k long")
        .select("k", hash_bucket(F.col("k")).alias("b")).collect()}
    duck_buckets = {
        k: duck.sql(
            "SELECT CAST(('0x' || substring(md5(CAST(? AS VARCHAR)), 1, 4)) "
            "AS INTEGER) % 100", params=[k]).fetchone()[0]
        for k in keys}
    assert spark_buckets == duck_buckets
    assert all(0 <= b < 100 for b in spark_buckets.values())


def test_split_is_stable_under_repartition(spark):
    """The property df.sample() lacks: membership must not depend on
    partitioning or row order."""
    df = spark.range(2000)
    a = train_eval_split(df.repartition(1), "id")
    b = train_eval_split(df.repartition(17).sortWithinPartitions(
        F.desc("id")), "id")
    sa = {(r["id"], r["split"]) for r in a.collect()}
    sb = {(r["id"], r["split"]) for r in b.collect()}
    assert sa == sb
    n_eval = sum(1 for _, s in sa if s == "eval")
    assert 120 <= n_eval <= 280  # ~10% of 2000, generous binomial bounds


def test_mixture_rates_are_respected(spark):
    df = spark.range(10_000).withColumn(
        "stratum", F.when(F.col("id") % 2 == 0, "a").otherwise("b"))
    kept = mixture_sample(df, "id", "stratum", rates={"a": 100, "b": 0})
    rows = kept.groupBy("stratum").count().collect()
    counts = {r["stratum"]: r["count"] for r in rows}
    assert counts == {"a": 5000}  # rate-100 keeps all, rate-0 keeps none


def test_temperature_resample_flattens_skewed_sources(spark):
    """On a skewed corpus, tau=0.5 resampling keeps ~sqrt(min_n/n) of
    each source: everything from the rarest source, ~sqrt-scaled from
    the head — so head:tail ratio drops from n_head/n_tail to about
    sqrt(n_head/n_tail). (The driver testdata is uniform across
    sources, where the op correctly keeps everything — this test
    supplies the skew.)"""
    from data_pipelines_course_spark.operators.sampling import hash_bucket

    rows = ([(i, "head") for i in range(1600)]
            + [(10_000 + i, "tail") for i in range(100)])
    docs = spark.createDataFrame(rows, "doc_id bigint, source string")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    mn = counts.agg(F.min("n").alias("mn"))
    rates = (counts.crossJoin(F.broadcast(mn))
             .select("source",
                     F.sqrt(F.col("mn").cast("double") / F.col("n"))
                     .alias("rate")))
    kept = (docs.join(F.broadcast(rates), "source")
            .filter(hash_bucket(F.col("doc_id"), 65536).cast("double")
                    < F.col("rate") * 65536))
    by_src = {r["source"]: r["cnt"] for r in
              kept.groupBy("source").agg(
                  F.count(F.lit(1)).alias("cnt")).collect()}
    assert by_src["tail"] == 100                 # rarest source: keep all
    # head: expected 1600 * sqrt(100/1600) = 400; md5-bucket noise is
    # binomial (sigma ~ 19), allow 5 sigma.
    assert 300 <= by_src["head"] <= 500, by_src
    # Determinism: a repartition must not change membership.
    kept2 = (docs.repartition(7).join(F.broadcast(rates), "source")
             .filter(hash_bucket(F.col("doc_id"), 65536).cast("double")
                     < F.col("rate") * 65536))
    assert sorted(r["doc_id"] for r in kept.collect()) == \
        sorted(r["doc_id"] for r in kept2.collect())
