"""DuckDB-oracle differential tests — the engine's sqllogictest analog
(SURVEY §5.2 item 1). Every registered query with an oracle is executed on
Spark and DuckDB at sf0.01 and compared by row count + schema + normalized
values. Mirrors the verify driver's CORRECTNESS gate.
"""

from __future__ import annotations

import pytest

from data_pipelines_course_spark.queries import all_oracles, all_queries

from .conftest import SF_DIR, assert_frames_match

ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    result = QUERIES[name](spark, SF_DIR)
    assert_frames_match(result, duck.sql(ORACLES[name]), name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Queries without an oracle must still execute and return a stable
    schema (driver records a rows-only check)."""
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns  # schema resolved
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "l_returnflag" in df.columns
    assert "l_quantity min" in df.columns  # "<col> <fn>" naming preserved


def test_every_query_has_unique_name():
    assert len(QUERIES) == len(set(QUERIES))
    unknown = set(ORACLES) - set(QUERIES)
    assert not unknown, f"oracles without queries: {unknown}"


SMALL_SF_SENSITIVE = (
    # queries with driver-side init/training that needs >= K rows, or
    # convergence loops — the shapes a degenerate scale factor can break
    # (the full ad-hoc sweep of all 149 queries at sf0.001 passed during
    # round 3; this pins the fragile subset in CI)
    "pq_topk", "ivf_pq_topk", "ivf_topk", "ann_lsh_topk",
    "embedding_kmeans", "semdedup_candidates",
    "dedup_clusters", "dedup_clusters_twostar", "dedup_keep_best",
    "bpe_merge_table",
)


@pytest.mark.parametrize("name", SMALL_SF_SENSITIVE)
def test_training_loop_queries_survive_smoke_sf(spark, name):
    """The driver smoke-runs at sf0.001 (50-row embeddings, 500-doc
    corpus); every trainer/loop query must still initialize and
    converge there."""
    df = all_queries()[name](spark, "/root/testdata/sf0.001")
    assert df.limit(1).count() >= 0
