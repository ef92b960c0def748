"""Digest-staging gate (VERDICT r5 #3): the SPARK_GRAFT_STAGING env var
selects how multiply-consumed digest tables materialize (localCheckpoint
| persist | none). Values must be identical in every mode — the mode is
purely an execution-resilience choice (localCheckpoint blocks have no
lineage fallback on executor loss; persist recomputes; none re-derives).
The round's full-registry proof is driver_sim under persist; these tests
pin the contract in-suite on representative queries from each staged
family (shingle, signature, simhash-chunk, curation digests)."""

from __future__ import annotations

import pytest

from data_pipelines_course_spark.queries import all_queries, load_registry
from tests.conftest import SF_DIR


def _rows(df):
    cols = sorted(df.columns)
    return sorted(map(repr, (tuple(r[c] for c in cols)
                             for r in df.collect())))


@pytest.mark.parametrize("name", [
    "ngram_jaccard_threshold_prefix",   # staged shingle digest, 2 consumers
    "minhash_lsh_pairs",                # staged signature table
    "simhash_pairs",                    # staged chunk table
    "decontaminate_lsh",                # two staged signature tables
    "curation_attrition_report",        # staged survivor/5-gram digests
])
def test_staging_modes_are_value_neutral(spark, monkeypatch, name):
    load_registry()
    fn = all_queries()[name]
    got = {}
    for mode in ("checkpoint", "persist", "none"):
        monkeypatch.setenv("SPARK_GRAFT_STAGING", mode)
        got[mode] = _rows(fn(spark, SF_DIR))
    assert got["checkpoint"] == got["persist"] == got["none"]
    assert got["checkpoint"]  # non-degenerate: the query returns rows


def test_unknown_staging_mode_fails_loudly(spark, monkeypatch):
    from data_pipelines_course_spark.staging import stage

    monkeypatch.setenv("SPARK_GRAFT_STAGING", "replicate")
    with pytest.raises(ValueError, match="SPARK_GRAFT_STAGING"):
        stage(spark.range(3).toDF("id"))


def test_persist_mode_retains_lineage(spark, monkeypatch):
    """persist mode must keep the recomputable lineage (the whole point:
    executor loss degrades to recompute, not job failure) while
    checkpoint mode truncates it to an RDD scan."""
    from data_pipelines_course_spark.staging import stage

    base = spark.range(100).toDF("id").selectExpr("id", "id * 2 AS v")
    monkeypatch.setenv("SPARK_GRAFT_STAGING", "persist")
    p = stage(base)
    assert p.storageLevel.useDisk  # MEMORY_AND_DISK
    plan = p._jdf.queryExecution().analyzed().toString()
    assert "Range" in plan  # source still in lineage
    p.unpersist()
    monkeypatch.setenv("SPARK_GRAFT_STAGING", "checkpoint")
    c = stage(base)
    plan = c._jdf.queryExecution().analyzed().toString()
    assert "Range" not in plan  # lineage truncated (LogicalRDD)


def test_persist_mode_recomputes_lost_blocks(spark, monkeypatch):
    """Fault injection (VERDICT r6 #4): persist's RESILIENCE claim —
    lost staged blocks degrade to lineage recompute, not job failure —
    observed, not assumed. Run a staged query under persist, consume it
    once (materializing the digest blocks in the cache manager), DROP
    every cached block mid-stream via spark.catalog.clearCache() — the
    local stand-in for an executor taking its block manager down — then
    consume the same constructed frame again and require a hash match.

    The mirror-image injection under `checkpoint` mode (drop a
    localCheckpoint block, observe the job FAIL because lineage is
    truncated) is NOT locally testable: localCheckpoint blocks live in
    RDD storage, not the SQL cache manager, and a single-JVM local run
    has no executor whose loss would drop them — the only handle would
    be reaching into the staged frame's internal RDD, which the query
    surface deliberately does not expose. That failure mode is
    documented at staging.py's mode table instead."""
    from data_pipelines_course_spark.staging import stage  # noqa: F401

    load_registry()
    fn = all_queries()["ngram_jaccard_threshold_prefix"]
    monkeypatch.setenv("SPARK_GRAFT_STAGING", "persist")
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()  # isolate: start with an empty SQL cache
    assert cache_mgr.isEmpty()
    df = fn(spark, SF_DIR)
    # Dataset.persist registers the staged digest plan eagerly.
    assert not cache_mgr.isEmpty()
    first = _rows(df)  # first consumer materializes the staged blocks
    spark.catalog.clearCache()  # inject: every staged block is lost
    assert cache_mgr.isEmpty()
    # Second consumer of the SAME constructed frame: its compiled plan
    # still scans the (now-empty) in-memory relation, whose cache
    # buffers must rebuild from the retained lineage.
    assert _rows(df) == first
    assert first  # non-degenerate


def test_aqe_env_gate_value_neutral(spark, monkeypatch):
    """SPARK_GRAFT_AQE=false (session._runtime_conf) disables adaptive
    execution engine-wide; the queries that lean hardest on runtime
    re-planning (salted skew join, AQE-coalesced aggregates) must return
    identical values — AQE may only change the physical strategy."""
    from data_pipelines_course_spark.session import configure

    name = "salted_join_segment_revenue"
    load_registry()
    fn = all_queries()[name]
    base = _rows(fn(spark, SF_DIR))
    monkeypatch.setenv("SPARK_GRAFT_AQE", "false")
    configure(spark)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert _rows(fn(spark, SF_DIR)) == base
    monkeypatch.delenv("SPARK_GRAFT_AQE")
    configure(spark)  # restore for the rest of the session-scoped suite
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
