"""Golden-output tests against the reference's frozen notebook values
(SURVEY §5.1 "golden outputs" / §5.2 item 4).

The original blobs are missing from the reference repo, so these run the
SAME query shapes over generated lookalikes whose queried marginals equal
the frozen outputs exactly (see sources/golden.py). What is being tested
is the ENGINE's derivation path — CSV round-trip, to_timestamp parsing,
the Monday=0 weekday shim, hour extraction, value_counts/top-k — not the
generator: every asserted number comes out of derived columns.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F, types as T

from data_pipelines_course_spark.functions.scalar import weekday_py
from data_pipelines_course_spark.sources.golden import (
    MVT_DOW_COUNTS,
    MVT_HOUR_HEAD,
    MVT_TOTAL,
    europarl_lookalike,
    mvt_lookalike,
)
from data_pipelines_course_spark.sources.readers import read_csv, read_text


@pytest.fixture(scope="module")
def mvt_parsed(spark, tmp_path_factory):
    """Raw fixture → CSV on disk → engine CSV scan → derived datetime
    parts, mirroring the notebook's read_csv + assign pipeline
    (Extras...ipynb:107-140)."""
    path = str(tmp_path_factory.mktemp("golden") / "mvt_csv")
    mvt_lookalike(spark).write.mode("overwrite").option("header", True).csv(path)
    schema = T.StructType([
        T.StructField("date_raw", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
    ])
    raw = read_csv(spark, path, schema=schema)
    df = raw.withColumn(
        "datetime", F.to_timestamp("date_raw", "M/d/yy H:mm"))
    df = (df.withColumn("hour", F.hour("datetime"))
            .withColumn("dayofweek", weekday_py("datetime"))
            .withColumn("date", F.to_date("datetime")))
    df.cache()
    yield df
    df.unpersist()


def test_mvt_total_rows(mvt_parsed):
    """First Steps with Dask.ipynb:487 output — len(df2) == 191641."""
    assert mvt_parsed.count() == MVT_TOTAL


def test_mvt_dayofweek_counts(mvt_parsed):
    """:563 output — per-DayOfWeek counts, Python Monday=0 convention
    (exercises the F10 weekday shim end-to-end through CSV + parse)."""
    rows = (mvt_parsed.groupBy("dayofweek").count()
            .orderBy("dayofweek").collect())
    assert [r["dayofweek"] for r in rows] == list(range(7))
    assert [r["count"] for r in rows] == MVT_DOW_COUNTS


def test_mvt_hour_value_counts_head(mvt_parsed):
    """:609 output — Hour.value_counts() head: 22→14745, 0→13212,
    21→12434 (A5 value_counts through the engine, descending)."""
    top = (mvt_parsed.groupBy("hour").count()
           .orderBy(F.desc("count"), "hour").limit(3).collect())
    assert {r["hour"]: r["count"] for r in top} == MVT_HOUR_HEAD


def test_mvt_yearly_divisions_span(mvt_parsed):
    """:377/:465 outputs — sorted DateTime index divided into yearly
    partitions 2001..2012; the engine analog is a year partition column
    spanning exactly those years (W2)."""
    years = (mvt_parsed.select(F.year("date").alias("y"))
             .distinct().orderBy("y").collect())
    ys = [r["y"] for r in years]
    assert ys[0] == 2001 and ys[-1] == 2012
    assert ys == list(range(2001, 2013))


def test_europarl_union_count(spark, tmp_path_factory):
    """Introduction to PySpark.ipynb:229 output — filter 'Deutschland',
    filter 'Merkel', RDD union (multiset — dups kept) counts 890, through
    a real text-file round trip (S4 + P1 + J3)."""
    path = str(tmp_path_factory.mktemp("golden") / "europarl_txt")
    europarl_lookalike(spark).write.mode("overwrite").text(path)
    lines = read_text(spark, path)
    de = lines.filter(F.col("value").contains("Deutschland"))
    merkel = lines.filter(F.col("value").contains("Merkel"))
    de_merkel = de.unionAll(merkel)
    assert de_merkel.count() == 890
    # overlap really exists (the 30 dual-keyword lines are counted twice)
    assert de_merkel.distinct().count() == 860
