"""Custom Python data source (Spark 4 DataSource API) — the engine's
answer to the reference's hand-rolled source scripts.

The course builds sources imperatively: a REST poller
(`airflow/dags/twitter_airflow.py:87-104`), a random generator
(`airflow/dags/generate_twitter.py:40-55`), a socket feeder
(`streaming/tweepy_stream.py:47-83`) — each a driver-side loop that
produces rows the cluster then ingests. The DataSource API inverts
that: the source declares its schema and PARTITIONS, and every
executor pulls its own slice in parallel — the same move that makes
`spark.read.parquet` scale, applied to custom feeds.

`SyntheticEventsDataSource` is the registered exemplar: a deterministic
events generator (same shape as testdata `events`) whose rows are a
pure function of (seed, partition, offset) — so a read is reproducible,
splittable, and generated WHERE the partition runs, never on the
driver. At 100 TB the pattern is the point, not the fake data: a REST
source with N cursor ranges or a Kafka-like feed with N shards maps
onto `partitions()` the same way.

Usage::

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("rows_per_partition", 1000)
          .option("partitions", 8)
          .option("seed", 42)
          .load())
"""

from __future__ import annotations

import datetime as _dt
import hashlib

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

# The reader classes ship to executors whose Python workers may not have
# this repo on sys.path (the verify driver runs from an arbitrary cwd) —
# pickle the whole module by value so no executor-side import happens.
try:  # pragma: no cover - registration is a no-op on old cloudpickle
    from pyspark import cloudpickle as _cp
    import sys as _sys

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
_EPOCH = _dt.datetime(2024, 1, 1)


def _row(seed: int, part: int, i: int):
    """One deterministic event row — a pure function of its coordinates,
    so any executor (or a task retry) regenerates identical data."""
    h = hashlib.md5(f"{seed}:{part}:{i}".encode()).digest()
    u = int.from_bytes(h[:8], "big")
    event_id = part * 1_000_000 + i
    ts = _EPOCH + _dt.timedelta(seconds=(u % 2_592_000))  # within 30 days
    user_id = (u >> 16) % 1000
    event_type = _EVENT_TYPES[u % len(_EVENT_TYPES)]
    value = round((u % 100_000) / 100.0, 2)
    return (event_id, ts, user_id, event_type, value)


class _EventsPartition(InputPartition):
    def __init__(self, index: int):
        self.index = index


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows_per_partition", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        # One InputPartition per slice: Spark schedules one task each,
        # so generation parallelism == partitions option, executor-side.
        return [_EventsPartition(i) for i in range(self.n_parts)]

    def read(self, partition: _EventsPartition):
        for i in range(self.rows):
            yield _row(self.seed, partition.index, i)


class SyntheticEventsDataSource(DataSource):
    """`format("synthetic_events")` after registration."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return ("event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double")

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)


# ---------------------------------------------------------------------------
# Streaming half of the DataSource API (Spark 4): the same deterministic
# generator exposed as a MICRO-BATCH source with real offset bookkeeping —
# the declarative replacement for the reference's while-True socket feeder
# (streaming/tweepy_stream.py:47-83).
#
# API choice, learned the hard way: the partition-parallel
# DataSourceStreamReader derives `latestOffset()` from INSTANCE state, so
# a restarted query (fresh reader, checkpointed start offset it never
# sees) can only re-announce its own counter — the stream stalls at the
# committed offset forever. That API fits sources with an EXTERNAL offset
# authority (Kafka end-offsets, a cursor endpoint). A self-generating
# source's authority is the offset itself, which is exactly what
# SimpleDataSourceStreamReader models: `read(start)` receives the
# committed offset and returns (rows, nextOffset) — restart-correct by
# construction. Trade-off: rows for the CURRENT batch materialize on the
# driver (fine for control-plane-sized batches); replays go through
# readBetweenOffsets, which regenerates deterministically.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class SyntheticEventsSimpleStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch generator: each read() call publishes rows_per_batch
    offsets per partition starting at the CHECKPOINTED offset, so a
    restarted query resumes exactly where it committed — no duplicates,
    no gaps (asserted across two checkpoint-sharing drains in
    tests/test_pyds.py). Rows are the same pure function of (seed,
    partition, offset) as the batch reader, so a replayed range is
    bit-identical — what makes checkpoint recovery exactly-once for a
    generator source."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.n_parts = int(options.get("partitions", 2))
        self.seed = int(options.get("seed", 0))

    def initialOffset(self):
        return {"i": 0}

    def _rows(self, s: int, e: int):
        return [_row(self.seed, p, i)
                for p in range(self.n_parts) for i in range(s, e)]

    def read(self, start):
        s = start["i"]
        e = s + self.rows_per_batch
        return (iter(self._rows(s, e)), {"i": e})

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(start["i"], end["i"]))

    def commit(self, end):
        pass  # nothing to clean up: data is regenerable by construction


def _simple_stream_reader(self, schema):
    return SyntheticEventsSimpleStreamReader(self.options)


SyntheticEventsDataSource.simpleStreamReader = _simple_stream_reader
