"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query (SURVEY A1 re-expressed) on sf0.001.
queries()       — every implemented operator from SURVEY.md §2 (+ the
                  dedup/similarity/text/multimodal engine-surface ops).
oracle_sql()    — DuckDB-equivalent ANSI SQL per query where the
                  semantics are SQL-expressible; LSH/SimHash/ANN entries
                  are intentionally absent (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipelines_course_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY A1: grouped multi-column multi-function agg
    with "<col> <fn>" naming, celery_app/tasks.py:24-31) on sf0.001."""
    from data_pipelines_course_spark.operators.relational import (
        flagship_grouped_agg,
    )

    return flagship_grouped_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
