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
