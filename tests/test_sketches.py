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


def test_cms_one_sided_error_bound(spark):
    """CMS guarantee: estimate >= exact always; estimate <= exact + eps·N
    with probability >= confidence — checked for the exact top-10
    tokens, where N is the total token stream length."""
    from data_pipelines_course_spark.datasets import load
    from data_pipelines_course_spark.operators.sketches import (
        CMS_EPS,
        _doc_tokens,
        cms_estimate,
        cms_read,
        cms_token_sketch,
    )
    from pyspark.sql import functions as F

    docs = load(spark, SF_DIR, "documents")
    toks = _doc_tokens(docs)
    n_total = toks.count()
    exact = {r["tok"]: r["cnt"] for r in
             toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
             .orderBy(F.desc("cnt"), "tok").limit(10).collect()}

    cms = cms_read(spark, cms_token_sketch(docs))
    est = cms_estimate(cms, list(exact))
    for tok, true_cnt in exact.items():
        assert est[tok] >= true_cnt
        assert est[tok] <= true_cnt + CMS_EPS * n_total


def test_cms_per_slice_merge_equals_whole(spark):
    """Per-source sketches (same eps/conf/seed => same hash planes)
    merged cell-wise must estimate exactly like the one-pass
    whole-corpus sketch — the rollup-table design in miniature."""
    from data_pipelines_course_spark.datasets import load
    from data_pipelines_course_spark.operators.sketches import (
        _doc_tokens,
        cms_estimate,
        cms_merge,
        cms_read,
        cms_token_sketch,
    )
    from pyspark.sql import functions as F

    docs = load(spark, SF_DIR, "documents")
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    assert len(sources) >= 2
    slices = [cms_token_sketch(docs.filter(F.col("source") == s))
              for s in sources]
    merged = cms_merge(spark, slices)
    whole = cms_read(spark, cms_token_sketch(docs))

    probe = [r["tok"] for r in
             _doc_tokens(docs).groupBy("tok").count()
             .orderBy(F.desc("count"), "tok").limit(20).collect()]
    assert cms_estimate(merged, probe) == cms_estimate(whole, probe)
