"""Source-reader tests (SURVEY §2.1): explicit-schema CSV/JSON/text reads,
glob + gzip handling, and the P4 bad-record quarantine channel."""

from __future__ import annotations

import gzip

from pyspark.sql import types as T

from data_pipelines_course_spark.schemas import CHATLOGS, QUOTES_TODAY
from data_pipelines_course_spark.sources import readers


def test_read_csv_headerless_named_columns(spark, tmp_path):
    """S3 — the Yahoo quotes shape: no header, caller names columns."""
    f = tmp_path / "quotes.csv"
    f.write_text('"FB",104.5,"4:00pm"\n"GOOG",700.1,"4:00pm"\n')
    df = readers.read_csv_headerless(spark, str(f), QUOTES_TODAY)
    rows = {r["stock"]: r["price"] for r in df.collect()}
    assert rows == {"FB": 104.5, "GOOG": 700.1}


def test_read_jsonl_multiglob_gzip(spark, tmp_path):
    """S5 — union of two globs, one gzipped (dask bag.read_text shape)."""
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    (tmp_path / "a" / "x.jsonl").write_text(
        '{"type": "PushEvent", "n": 1}\n{"type": "ForkEvent", "n": 2}\n')
    with gzip.open(tmp_path / "b" / "y.jsonl.gz", "wt") as f:
        f.write('{"type": "PushEvent", "n": 3}\n')
    schema = T.StructType([T.StructField("type", T.StringType()),
                           T.StructField("n", T.LongType())])
    df = readers.read_jsonl(
        spark, [str(tmp_path / "a" / "*.jsonl"),
                str(tmp_path / "b" / "*.jsonl.gz")], schema)
    assert df.count() == 3
    assert df.filter(df.type == "PushEvent").count() == 2


def test_read_json_document_multiline(spark, tmp_path):
    """S6 — one file holding a JSON array of objects (chatlogs)."""
    f = tmp_path / "chatlogs.json"
    f.write_text(
        '[{"timestamp": "2016-01-01T00:00:00+00:00", "message": "hello '
        'world", "datatype": "message", "nick": "alice"},\n'
        ' {"timestamp": "2016-01-01T00:00:01+00:00", "message": "hello", '
        '"datatype": "message", "nick": "bob"}]')
    df = readers.read_json_document(spark, str(f), CHATLOGS)
    assert df.count() == 2
    assert set(df.columns) == {"timestamp", "message", "datatype", "nick"}


def test_quarantine_channel(spark, tmp_path):
    """P4 — malformed rows land in the quarantine frame, not an exception
    (the engine's answer to the reference's ad-hoc error handling)."""
    f = tmp_path / "events.jsonl"
    f.write_text('{"id": 1, "v": 2.0}\n'
                 'THIS IS NOT JSON\n'
                 '{"id": 3, "v": 4.0}\n')
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.DoubleType())])
    good, bad = readers.read_with_quarantine(spark, str(f), schema)
    assert sorted(r["id"] for r in good.collect()) == [1, 3]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "NOT JSON" in bad_rows[0][0]


def test_read_csv_glob_partitioned(spark, tmp_path):
    """S1/S2 — glob CSV scan over per-partition files (dask
    read_csv('data/fake_data_*.csv') shape)."""
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.DoubleType())])
    (tmp_path / "fake_data_1.csv").write_text("id,v\n1,1.5\n2,2.5\n")
    (tmp_path / "fake_data_2.csv").write_text("id,v\n3,3.5\n")
    df = readers.read_csv(spark, str(tmp_path / "fake_data_*.csv"), schema)
    assert sorted(r["id"] for r in df.collect()) == [1, 2, 3]


def test_read_text_lines(spark, tmp_path):
    """S4 — line-oriented text scan (sc.textFile analog)."""
    f = tmp_path / "speech.txt"
    f.write_text("line one\nline two\nDeutschland line\n")
    df = readers.read_text(spark, str(f))
    assert df.count() == 3
    assert df.filter(df.value.contains("Deutschland")).count() == 1


def test_parallelize_partition_count(spark):
    """S14 — sc.parallelize(range(1000), 20) analog: explicit degree."""
    df = readers.parallelize(spark, 1000, partitions=20)
    assert df.rdd.getNumPartitions() == 20
    assert df.count() == 1000


def test_synthetic_timeseries_deterministic(spark):
    """S15 — same seed ⇒ identical fixture across runs."""
    a = readers.synthetic_timeseries(spark, "2020-01-01", 10).collect()
    b = readers.synthetic_timeseries(spark, "2020-01-01", 10).collect()
    assert a == b
    assert len(a) == 10


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC write → read → filtered scan: values survive and the predicate
    reaches the ORC reader (same §4.1 pushdown story as parquet)."""
    from data_pipelines_course_spark.datasets import load
    from data_pipelines_course_spark.sinks.writers import write_orc
    from data_pipelines_course_spark.sources.readers import read_orc
    from data_pipelines_course_spark.plans import analysis as pa
    from pyspark.sql import functions as F

    path = str(tmp_path / "nation_orc")
    nation = load(spark, "/root/testdata/sf0.01", "nation")
    write_orc(nation, path)
    back = read_orc(spark, path)
    assert back.count() == 25
    assert dict(back.dtypes) == dict(nation.dtypes)
    filtered = back.filter(F.col("n_regionkey") == 0).select("n_name")
    assert "n_regionkey" in " ".join(pa.pushed_filters(filtered))
    assert filtered.count() == nation.filter("n_regionkey = 0").count()


def test_xml_roundtrip_and_embedded_extract(spark, tmp_path):
    """XML write → read preserves values and types where XML can
    (attributes/elements inferred); from_xml parses embedded fragments
    JVM-side with null-on-malformed quarantine semantics."""
    from data_pipelines_course_spark.datasets import load
    from data_pipelines_course_spark.sinks.writers import write_xml
    from data_pipelines_course_spark.sources.readers import (
        read_xml, xml_column_extract)
    from pyspark.sql import functions as F

    path = str(tmp_path / "nation_xml")
    nation = load(spark, "/root/testdata/sf0.01", "nation")
    write_xml(nation, path, row_tag="nation")
    back = read_xml(spark, path, row_tag="nation")
    assert back.count() == 25
    assert (sorted(back.select("n_nationkey", "n_name").collect())
            == sorted(nation.select("n_nationkey", "n_name").collect()))

    frags = spark.createDataFrame(
        [(1, "<r><qty>7</qty><who>ann</who></r>"),
         (2, "not xml at all")],
        "id int, payload string")
    parsed = xml_column_extract(frags, "payload", "qty INT, who STRING")
    rows = {r["id"]: r["payload_parsed"] for r in parsed.collect()}
    assert rows[1]["qty"] == 7 and rows[1]["who"] == "ann"
    assert rows[2] is None or rows[2]["qty"] is None  # malformed -> null
