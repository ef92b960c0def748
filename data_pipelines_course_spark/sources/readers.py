"""Batch source readers (SURVEY §2.1 S1-S6, S10, S14-S15) with explicit
schemas (§1.3 decision) and a bad-record quarantine channel (P4).

The reference's external-API sources (S8/S9 REST, S16 stock API) are
driver-side ingestion utilities by design (SURVEY §3.2: "REST stays
driver-side") — they land files for these readers; see plans/pipeline.py
for the retrying ingestion stage they run in. Nothing network-bound ever
sits inside a Catalyst plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..session import configure

CORRUPT_COL = "_corrupt_record"


def read_csv(spark: SparkSession, path: str, schema: T.StructType,
             header: bool = True, sep: str = ",") -> DataFrame:
    """S1/S2 — CSV scan, single path or glob (glob is native; the
    reference's dask glob read at First Steps with Dask.ipynb:642 maps to
    the same call)."""
    configure(spark)
    return spark.read.csv(path, schema=schema, header=header, sep=sep)


def read_csv_headerless(spark: SparkSession, path: str,
                        schema: T.StructType) -> DataFrame:
    """S3 — header-less CSV with caller-named columns (reference:
    pd.read_csv(url, names=[...]), celery_app/tasks.py:71-73). Explicit
    schema is mandatory — there is no header to infer from."""
    configure(spark)
    return spark.read.csv(path, schema=schema, header=False)


def read_jsonl(spark: SparkSession, paths: str | list[str],
               schema: T.StructType) -> DataFrame:
    """S5 — JSON-lines scan; accepts a list of globs and gzipped input
    transparently (reference: bag.read_text([glob1, glob2]).map(json.loads),
    Learning Dask Bags.ipynb:35)."""
    configure(spark)
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.json(paths, schema=schema)


def read_json_document(spark: SparkSession, path: str,
                       schema: T.StructType) -> DataFrame:
    """S6 — one JSON document holding an array of objects (reference:
    json.load over chatlogs, luigi/wordcount_map_reduce.py:16)."""
    configure(spark)
    return spark.read.json(path, schema=schema, multiLine=True)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """S4/S11 — line-oriented text; `path` may be any Hadoop URI
    (file://, hdfs://) — the reference's HdfsTarget is just a URI here."""
    configure(spark)
    return spark.read.text(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Columnar-format breadth beyond the reference's CSV/JSON world: ORC
    scans get the same Catalyst treatment as parquet (vectorized reader,
    predicate pushdown, column pruning) — the storage choice is a config,
    not an architecture. Native since Spark 2.3; no extra jar."""
    configure(spark)
    return spark.read.orc(path)


def read_with_quarantine(spark: SparkSession, path: str,
                         schema: T.StructType, fmt: str = "json",
                         ) -> tuple[DataFrame, DataFrame]:
    """P4 — validation filter / bad-record channel. The reference rejects
    error rows ad hoc (HTTP cod != 200 raise, skipped EmptyDataError
    files, failed futures — SURVEY P4). The engine standardizes on
    PERMISSIVE parsing with a corrupt-record column: returns
    (good_rows, quarantine) so bad input is *data*, not control flow.

    Scale note: one scan feeds both outputs; the quarantine side is a
    filter on the same cached pass, not a re-read."""
    configure(spark)
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    reader = spark.read.schema(full_schema).option("mode", "PERMISSIVE") \
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    df = reader.json(path) if fmt == "json" else reader.csv(path)
    # The corrupt-record column can only be filtered on a cached scan
    # (Spark's documented restriction). localCheckpoint() the two
    # outputs (one materialization each off the shared cache), then
    # RELEASE the cache: the old code leaked one cached relation per
    # ingest call for the session's lifetime (review r4), and the
    # checkpointed outputs no longer reference it.
    df = df.cache()
    try:
        good = (df.filter(F.col(CORRUPT_COL).isNull())
                .drop(CORRUPT_COL).localCheckpoint())
        bad = (df.filter(F.col(CORRUPT_COL).isNotNull())
               .select(CORRUPT_COL).localCheckpoint())
    finally:
        df.unpersist()
    return good, bad


def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              lower_bound: int | None = None, upper_bound: int | None = None,
              num_partitions: int = 16,
              properties: dict[str, str] | None = None) -> DataFrame:
    """S7 — JDBC/SQL scan (`pd.read_sql_query` on SQLite,
    airflow/dags/twitter_airflow.py:132-135). `table` may be a table name
    or a pushdown subquery `(SELECT ... ) t` — the reference's hand-written
    date-filter pushdown into SQLite becomes Catalyst's JDBC pushdown.

    Scale: without a partition_column a JDBC read is ONE connection on one
    executor; always pass (partition_column, lower/upper bound) for any
    table worth distributing. Requires the target database's JDBC driver
    jar on the Spark classpath; tests/test_jdbc.py exercises the full
    append + pushdown-subquery + partitioned-read cycle against embedded
    Derby (bundled with Spark), mirroring the reference's SQLite plumbing."""
    configure(spark)
    reader = spark.read
    if partition_column is not None:
        return reader.jdbc(
            url, table, column=partition_column,
            lowerBound=lower_bound, upperBound=upper_bound,
            numPartitions=num_partitions, properties=properties or {})
    return reader.jdbc(url, table, properties=properties or {})


def parallelize(spark: SparkSession, n: int, partitions: int = None) -> DataFrame:
    """S14 — sc.parallelize(range(n), p) analog
    (PySpark.ipynb:73: 20 partitions / 1000 elems)."""
    configure(spark)
    df = spark.range(n)
    return df.repartition(partitions) if partitions else df


def synthetic_timeseries(spark: SparkSession, start: str, days: int,
                         seed: int = 42) -> DataFrame:
    """S15/F-10 — deterministic synthetic daily series (reference
    generator: First Steps with Dask.ipynb:620, one CSV per year with
    date, A=randn, B=randint). rand/randn with a fixed seed keeps the
    fixture reproducible."""
    configure(spark)
    # Pinned partition count: rand/randn are seeded PER PARTITION, so
    # letting spark.range follow defaultParallelism would make the
    # "reproducible" fixture differ between a 4-core and an 8-core
    # machine (review r4).
    return (spark.range(0, days, 1, numPartitions=4)
            .select(F.date_add(F.lit(start).cast("date"),
                               F.col("id").cast("int")).alias("date"),
                    F.randn(seed).alias("a"),
                    (F.rand(seed) * 1000).cast("long").alias("b")))


def read_xml(spark: SparkSession, path: str, row_tag: str = "row",
             schema: T.StructType | None = None) -> DataFrame:
    """XML scan — source-format breadth for the feeds the reference's
    REST/CSV world doesn't cover (sitemaps, RSS/Atom, SOAP exports,
    Wikipedia dumps — the classic crawl-adjacent corpus formats).
    Built into Spark 4 (SPARK-44265, the Databricks spark-xml donation):
    each `row_tag` element becomes a row, attributes surface as
    `_attr` columns, and schema inference works like JSON. Pass an
    explicit schema in production — inference reads the data twice,
    the same rule the CSV readers here follow."""
    configure(spark)
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def xml_column_extract(df: DataFrame, col: str, schema_ddl: str) -> DataFrame:
    """Parse an embedded-XML string column into a typed struct with
    `from_xml` (the F17 JSON-parse shape for XML payloads): stays fully
    JVM-side, so a million-row column of XML fragments never touches
    Python. Malformed fragments yield null structs — the quarantine
    pattern (P4) applies downstream unchanged."""
    from pyspark.sql import functions as F
    return df.withColumn(f"{col}_parsed",
                         F.expr(f"from_xml({col}, '{schema_ddl}')"))
