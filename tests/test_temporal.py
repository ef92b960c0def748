"""Unit tests for the generic temporal operators (as-of join, banded
range join) on adversarial shapes the registered queries don't reach:
NULL payloads in the matched row, equal-timestamp ties, and left-outer
multiplicity of the banded join. Pins the round-4 review fixes."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_pipelines_course_spark.operators.temporal import (
    asof_join, banded_range_join)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_carries_the_matched_row_whole(spark):
    """The as-of match must return THE matched right row — when that
    row's payload is NULL, the output is NULL, never a resurrected value
    from an older row (the per-column last() chimera, review r4)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:03"))], "user_id bigint, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:01"), 5.0),
         (1, _ts("2024-01-01 00:00:02"), None)],
        "user_id bigint, ts timestamp, value double")
    got = asof_join(left, right, on="user_id").collect()
    assert len(got) == 1
    assert got[0]["r_ts"] == _ts("2024-01-01 00:00:02")  # newest row wins
    assert got[0]["r_value"] is None                     # ...whole, not mixed


def test_asof_join_breaks_right_ties_deterministically(spark):
    """Equal-(key, ts) right rows: the winner is the greatest payload
    struct, invariant under repartitioning (bare last() was
    partition-order-dependent, review r4)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:01:00"))], "user_id bigint, ts timestamp")
    tie = _ts("2024-01-01 00:00:30")
    rows = [(1, tie, float(v)) for v in (7, 3, 9, 1)]
    right = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double")
    for parts in (1, 7):
        got = asof_join(left, right.repartition(parts),
                        on="user_id").collect()
        assert got[0]["r_value"] == 9.0  # max struct = max (ts, value)


def test_banded_range_join_left_outer_multiplicity(spark):
    """With left_id, the banded join has TRUE left-outer multiplicity:
    matched left rows emit exactly their matches (no band-artifact null
    row), unmatched ones exactly one null row (review r4)."""
    left = spark.createDataFrame(
        [(10, 1, _ts("2024-01-01 10:00:00")),    # 2 clicks in window
         (20, 1, _ts("2024-01-05 10:00:00"))],   # none
        "event_id bigint, user_id bigint, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:10:00")),
         (1, _ts("2024-01-01 09:50:00")),
         (1, _ts("2024-01-04 00:00:00"))],
        "user_id bigint, ts timestamp")
    got = banded_range_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        window_expr=F.expr("INTERVAL 1 HOUR"),
        band_micros=3_600_000_000, left_id="event_id")
    rows = sorted([(r["event_id"], r["r_ts"]) for r in got.collect()])
    assert [e for e, _ in rows] == [10, 10, 20]  # 2 matches + 1 null row
    assert rows[2][1] is None
    # Raw banded shape (left_id=None): band artifacts present, as
    # documented — 1 null row beside the matches, 2 for the unmatched.
    raw = banded_range_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        window_expr=F.expr("INTERVAL 1 HOUR"), band_micros=3_600_000_000)
    raw_rows = [(r["event_id"], r["r_ts"]) for r in raw.collect()]
    assert sorted(e for e, _ in raw_rows) == [10, 10, 10, 20, 20]
