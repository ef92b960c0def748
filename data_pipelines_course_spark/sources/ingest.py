"""Driver-side ingestion of external APIs — the engine's S8/S9/S10 story.

The reference pulls from REST APIs in three shapes: a one-shot JSON fetch
per key (OpenWeather — `Chapter 4 - Dask Distributed.ipynb:37-62`), a
paged, rate-limited cursor capped at MAX_TWEEPY_PAGE=300 pages
(`airflow/dags/twitter_airflow.py:20, :87-92`), and a streamed bulk file
download (`luigi/taxi_data_import.py:67-71`), with retry-with-backoff on
failure (`celery_app/tasks.py:72-77`).

SURVEY §3.2's verdict: external APIs are nondeterministic and rate-bound,
so they are NOT Catalyst sources — they run on the driver (or, for large
key sets, inside `mapInPandas`), land rows with an explicit schema, and
everything downstream is a normal DataFrame. The fetch function is
injected, which is also what makes the layer testable without a network
(the reference's own tests hit live Yahoo and are flaky for it —
SURVEY §5.1).

At 100 TB these helpers ingest METADATA (API catalogs, manifests); bulk
data always lands as files first (`download_to`) and is read by
`spark.read` so the scan parallelizes.
"""

from __future__ import annotations

import shutil
import time
from collections.abc import Callable, Iterable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["retry", "fetch_records", "fetch_paged", "download_to"]

MAX_PAGES = 300  # reference: MAX_TWEEPY_PAGE (twitter_airflow.py:20)


def retry(fn: Callable[..., Any], attempts: int = 3,
          base_delay: float = 0.0) -> Callable[..., Any]:
    """Retry with exponential backoff — celery `self.retry` / airflow
    `retries`+`retry_delay` semantics (C4) as a plain wrapper."""
    def wrapped(*args: Any, **kwargs: Any) -> Any:
        for attempt in range(attempts):
            try:
                return fn(*args, **kwargs)
            except Exception:
                if attempt == attempts - 1:
                    raise
                if base_delay > 0:
                    time.sleep(base_delay * (2 ** attempt))
        raise AssertionError("unreachable")
    return wrapped


def fetch_records(spark: SparkSession, keys: Iterable[Any],
                  fetch: Callable[[Any], dict | None],
                  schema: StructType, attempts: int = 3,
                  base_delay: float = 0.0) -> DataFrame:
    """One fetch per key → DataFrame (S8: the per-city weather shape).

    A key whose fetch returns None (or keeps failing after `attempts`) is
    dropped, mirroring the reference's skip-failed-futures filter
    (`Chapter 4 - Dask Distributed.ipynb:257-264` — P4 bad-record
    channel). Schema is explicit: no inference on API payloads (§1.3)."""
    rows: list[dict] = []
    for key in keys:
        try:
            rec = retry(fetch, attempts, base_delay)(key)
        except Exception:
            continue
        if rec is not None:
            rows.append(rec)
    return spark.createDataFrame(rows, schema=schema)


def fetch_paged(spark: SparkSession,
                pages: Iterator[list[dict]],
                schema: StructType,
                max_pages: int = MAX_PAGES) -> DataFrame:
    """Paged cursor scan with a hard page cap (S9) and empty-result
    short-circuit (the reference stops the stage when a search returns
    nothing — twitter_airflow.py:95-96). The cap is the reference's
    `if page_num > MAX_TWEEPY_PAGE: break` — a limit pushed into the
    source, the only place a limit CAN be pushed for a cursor API."""
    from itertools import islice

    rows: list[dict] = []
    # islice, not a post-hoc page_num check: enumerate would FETCH page
    # max_pages+1 from the rate-limited cursor and throw it away — one
    # wasted quota hit per capped scan (review r4).
    for page in islice(pages, max_pages):
        if not page:
            break
        rows.extend(page)
    return spark.createDataFrame(rows, schema=schema)


def download_to(opener: Callable[[], Any], dest: str) -> str:
    """Streamed bulk download to a local/shared path (S10:
    `requests.get(url, stream=True)` + `copyfileobj`,
    taxi_data_import.py:67-71). `opener` returns a file-like object; the
    copy is chunked so a 10 GB file never lives in memory. Returns dest
    so pipelines can chain `spark.read` on it."""
    src = opener()
    try:
        with open(dest, "wb") as out:
            shutil.copyfileobj(src, out, length=1 << 20)
    finally:
        close = getattr(src, "close", None)
        if close:
            close()
    return dest
