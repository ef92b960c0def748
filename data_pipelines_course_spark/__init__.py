"""data_pipelines_course_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the computational surface of
kjam/data-pipelines-course (see SURVEY.md): its dataflow operators, query
semantics, data shapes, pipeline-orchestration semantics and test style —
implemented on the PySpark DataFrame/SQL/Catalyst/Structured-Streaming
stack, **not** a port of the reference's five runtimes (Celery, Luigi,
Airflow, Dask, RDD/DStream).

Layout:
    session.py    SparkSession factory + runtime conf normalization
    schemas.py    explicit StructType registry (SURVEY §1.3 decision)
    datasets.py   parquet loaders for the driver testdata tables
    queries.py    registry mapping query-name -> (spark, sf_dir) -> DataFrame
                  plus the DuckDB oracle SQL used by the correctness gate
    operators/    relational, window, dedup, similarity, text operators
    functions/    scalar/expr helpers (weekday shim, ratio, json adapters)
    sources/      batch readers (csv/json/text) with bad-record channel
    plans/        driver-side pipeline DSL (chain/group/chord semantics)
    streaming/    Structured Streaming jobs (socket/rate/file wordcount)
"""

__version__ = "0.1.0"


def explain(spark, name: str, sf_dir: str | None = None,
            mode: str = "formatted") -> str:
    """The engine's `visualize()` story (SURVEY §4.2 diagnostics row):
    the physical plan of a registered query by name, as a string.

    Equivalent of the reference's dask `visualize()` task graphs
    (`Chapter 4 - First Steps with Dask.ipynb:163`) — but checkable text
    (PushedFilters / ReadSchema / join strategies / Exchange nodes)
    instead of a picture. No execution is triggered."""
    from .datasets import DEFAULT_SF_DIR
    from .plans.analysis import formatted_plan
    from .queries import all_queries

    queries = all_queries()
    if name not in queries:
        raise KeyError(f"unknown query {name!r}; see queries.all_queries()")
    return formatted_plan(queries[name](spark, sf_dir or DEFAULT_SF_DIR),
                          mode=mode)
