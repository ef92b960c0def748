"""Driver-side ingestion (S8/S9/S10 + C4 retry) — tested with injected
fake fetchers, fixing the reference's live-network test flaw (its stock
tests hit Yahoo; SURVEY §5.1)."""

from __future__ import annotations

import io

import pytest
from pyspark.sql import types as T

from data_pipelines_course_spark.sources import ingest

SCHEMA = T.StructType([
    T.StructField("city", T.StringType()),
    T.StructField("temp", T.DoubleType()),
])


def test_fetch_records_happy_path(spark):
    df = ingest.fetch_records(
        spark, ["berlin", "paris"],
        lambda c: {"city": c, "temp": 20.0}, SCHEMA)
    rows = {r.city: r.temp for r in df.collect()}
    assert rows == {"berlin": 20.0, "paris": 20.0}


def test_fetch_records_retries_flaky_source(spark):
    calls = {"n": 0}

    def flaky(city):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        return {"city": city, "temp": 1.5}

    df = ingest.fetch_records(spark, ["oslo"], flaky, SCHEMA, attempts=3)
    assert [r.city for r in df.collect()] == ["oslo"]
    assert calls["n"] == 3


def test_fetch_records_drops_failed_and_none_keys(spark):
    def fetch(city):
        if city == "atlantis":
            raise ValueError("no such place")
        if city == "void":
            return None
        return {"city": city, "temp": 3.0}

    df = ingest.fetch_records(spark, ["rome", "atlantis", "void"], fetch,
                              SCHEMA, attempts=2)
    assert [r.city for r in df.collect()] == ["rome"]


def test_fetch_paged_respects_page_cap(spark):
    def pages():
        n = 0
        while True:  # endless cursor — the cap must stop it
            yield [{"city": f"c{n}", "temp": float(n)}]
            n += 1

    df = ingest.fetch_paged(spark, pages(), SCHEMA, max_pages=5)
    assert df.count() == 5


def test_fetch_paged_short_circuits_on_empty_page(spark):
    def pages():
        yield [{"city": "a", "temp": 1.0}]
        yield []          # reference: empty search result ends the stage
        yield [{"city": "never", "temp": 9.9}]

    df = ingest.fetch_paged(spark, pages(), SCHEMA)
    assert [r.city for r in df.collect()] == ["a"]


def test_download_to_streams_bytes(tmp_path):
    payload = b"x" * (3 << 20)
    dest = str(tmp_path / "bulk.bin")
    out = ingest.download_to(lambda: io.BytesIO(payload), dest)
    assert out == dest
    with open(dest, "rb") as f:
        assert f.read() == payload


def test_retry_raises_after_exhaustion():
    def always_fails():
        raise TimeoutError("down")

    with pytest.raises(TimeoutError):
        ingest.retry(always_fails, attempts=2)()
