"""JDBC round-trip tests (S7 / K3 / K4) against embedded Apache Derby.

The reference's central data plumbing is a SQL database: the Airflow DAG
appends tweet batches with `to_sql('tweets', conn, if_exists='append')`
and reads them back with a hand-pushed-down date filter
(airflow/dags/twitter_airflow.py:117-118, :132-135); Luigi does a 26-column
typed bulk copy (luigi/taxi_data_import.py:160-191 — the only explicit DDL
in the corpus). These tests exercise the same append + filtered-read cycle
through Spark's real JDBC code path.

Derby (10.16, bundled with Spark for the Hive metastore) runs embedded —
same JVM, no network — so the JDBC stack (DriverManager, JDBCRDD,
JdbcRelationProvider, savetable) is the genuine article. On a real cluster
you'd point the same two functions at Postgres/MySQL with the driver jar
in `--jars`; only the URL changes.
"""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import Row, functions as F

from data_pipelines_course_spark.sinks.writers import write_jdbc
from data_pipelines_course_spark.sources.readers import read_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db_dir};create=true"


def _tweet_rows(day: int, n: int = 5) -> list[Row]:
    """Lookalike of the reference's tweet batch (flattened, typed)."""
    base = datetime.datetime(2024, 1, day, 12, 0, 0)
    return [
        Row(tweet_id=day * 100 + i,
            text=f"tweet {day}-{i}",
            favorite_count=i * 10,
            created=base + datetime.timedelta(minutes=i),
            score=float(i) / 2.0)
        for i in range(n)
    ]


def test_jdbc_append_roundtrip(spark, derby_url):
    """K3 — two appends land 2×N rows with types preserved."""
    batch1 = spark.createDataFrame(_tweet_rows(day=1))
    batch2 = spark.createDataFrame(_tweet_rows(day=2))
    write_jdbc(batch1, derby_url, "tweets", mode="append",
               driver=DERBY_DRIVER)
    write_jdbc(batch2, derby_url, "tweets", mode="append",
               driver=DERBY_DRIVER)

    back = read_jdbc(spark, derby_url, "tweets",
                     properties={"driver": DERBY_DRIVER})
    assert back.count() == 10
    types = dict(back.dtypes)
    assert types["tweet_id"] == "bigint"
    assert types["created"] == "timestamp"
    assert types["score"] == "double"
    assert back.agg(F.sum("favorite_count")).collect()[0][0] == 2 * sum(
        i * 10 for i in range(5))


def test_jdbc_pushdown_subquery(spark, derby_url):
    """S7 — the reference's date-filtered `read_sql_query` becomes a
    pushdown subquery: the WHERE runs inside Derby, Spark scans only the
    matching rows (twitter_airflow.py:132-135 semantics)."""
    # Spark's JDBC writer emits CREATE TABLE tweets ("tweet_id" BIGINT, ...)
    # — unquoted table name (Derby upcases to TWEETS) but QUOTED column
    # names (case-sensitive lowercase), so the pushdown SQL must reference
    # the table unquoted and the columns quoted.
    sub = ('(SELECT "tweet_id", "favorite_count", "created" FROM tweets '
           "WHERE \"created\" >= TIMESTAMP('2024-01-02 00:00:00') "
           'AND "favorite_count" IS NOT NULL '
           'ORDER BY "favorite_count" DESC) t')
    top = read_jdbc(spark, derby_url, sub,
                    properties={"driver": DERBY_DRIVER})
    rows = top.collect()
    assert len(rows) == 5  # only day-2 batch passes the date filter
    assert all(r.tweet_id >= 200 for r in rows)


def test_jdbc_partitioned_read(spark, derby_url):
    """S7 scale path — partition_column splits the scan into ranged
    queries (one connection per partition instead of one total)."""
    df = read_jdbc(spark, derby_url, "tweets",
                   partition_column="tweet_id",
                   lower_bound=0, upper_bound=300, num_partitions=4,
                   properties={"driver": DERBY_DRIVER})
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 10


def test_jdbc_typed_bulk_copy(spark, derby_url):
    """K4 — Luigi's typed CopyToTable: overwrite mode creates the table
    from the DataFrame schema (typed, not positional), wide-ish row."""
    df = spark.createDataFrame(
        [Row(trip_id=i, pickup_lat=40.7 + i * 0.001,
             pickup_lon=-74.0 - i * 0.001, fare=12.5 + i,
             vendor=f"v{i % 3}",
             pickup_ts=datetime.datetime(2016, 1, 1, i % 24))
         for i in range(50)])
    write_jdbc(df, derby_url, "taxi_trips", mode="overwrite",
               driver=DERBY_DRIVER)
    back = read_jdbc(spark, derby_url, "taxi_trips",
                     properties={"driver": DERBY_DRIVER})
    assert back.count() == 50
    assert dict(back.dtypes)["pickup_lat"] == "double"
    # value fidelity through the round-trip
    got = {r.trip_id: r.fare for r in back.collect()}
    assert got[7] == 19.5


def test_streaming_foreach_batch_to_jdbc(spark, derby_url, tmp_path):
    """The reference's streaming-to-SQL story (tweet stream → SQLite
    append, K3's streaming variant): each micro-batch appends to a JDBC
    table via foreachBatch — the composition write_jdbc was designed for."""
    src = tmp_path / "stream_in"
    src.mkdir()
    (src / "f1.json").write_text("\n".join(
        f'{{"k": {i}, "v": "row{i}"}}' for i in range(20)) + "\n")
    stream = (spark.readStream.schema("k bigint, v string")
              .json(str(src)))
    q = (stream.writeStream
         .foreachBatch(lambda df, epoch: write_jdbc(
             df, derby_url, "stream_rows", mode="append",
             driver=DERBY_DRIVER))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    back = read_jdbc(spark, derby_url, "stream_rows",
                     properties={"driver": DERBY_DRIVER})
    assert back.count() == 20
    assert back.agg({"k": "sum"}).collect()[0][0] == sum(range(20))
