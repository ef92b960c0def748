"""Unit pins for the stream-convergence hooks' failure-detection logic
(the parity suite proves the green path; these prove the hooks can
actually catch a broken sink — ADVICE r4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_course_spark.operators.streamconv import (
    _rollup_mismatch_count,
)


def _frames(spark, streamed_rows, batch_rows):
    streamed = spark.createDataFrame(
        streamed_rows,
        "event_date date, event_type string, n_events bigint, "
        "sum_value double")
    batch = spark.createDataFrame(
        batch_rows,
        "event_date date, event_type string, b_n bigint, b_sum double")
    return streamed, batch


def test_rollup_mismatch_detects_one_sided_null_sum(spark):
    """A sink bug that nulls out a daily sum (while the batch side has a
    real value) must count as a mismatch — abs(x - NULL) is NULL and a
    naive filter drops the row, passing a broken sink."""
    import datetime as dt

    d = dt.date(2024, 1, 1)
    streamed, batch = _frames(
        spark,
        [(d, "click", 5, None)],           # sink nulled the sum
        [(d, "click", 5, 42.0)])
    assert _rollup_mismatch_count(streamed, batch) == 1
    # symmetric: batch NULL, streamed value
    streamed2, batch2 = _frames(
        spark, [(d, "click", 5, 42.0)], [(d, "click", 5, None)])
    assert _rollup_mismatch_count(streamed2, batch2) == 1


def test_rollup_mismatch_zero_on_agreement_incl_both_null(spark):
    import datetime as dt

    d = dt.date(2024, 1, 1)
    streamed, batch = _frames(
        spark,
        [(d, "click", 5, 42.0), (d, "view", 3, None)],
        [(d, "click", 5, 42.0 + 1e-9), (d, "view", 3, None)])
    assert _rollup_mismatch_count(streamed, batch) == 0


def test_rollup_mismatch_counts_missing_and_count_drift(spark):
    import datetime as dt

    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
    streamed, batch = _frames(
        spark,
        [(d1, "click", 5, 42.0)],                     # d2 missing in sink
        [(d1, "click", 6, 42.0), (d2, "view", 1, 1.0)])  # count drift + extra
    assert _rollup_mismatch_count(streamed, batch) == 2


def test_batch_split_covers_min_value_hash(spark):
    """The trending hook splits batches with pmod(xxhash64, 3); the old
    abs(hash) % 3 spelling loses rows whose hash is Long.MIN_VALUE
    (abs overflows negative). Pin that pmod partitions ALL rows."""
    df = spark.createDataFrame(
        [(str(i),) for i in range(500)], "window_start string")
    split = F.pmod(F.xxhash64("window_start"), F.lit(3))
    covered = sum(df.filter(split == i).count() for i in range(3))
    assert covered == 500
    # and that abs(MIN_VALUE) really is the hazard pmod avoids: under
    # ANSI (this engine's default) it CRASHES the batch split; with ANSI
    # off it silently overflows negative and the row lands in no batch.
    import pytest
    from pyspark.errors.exceptions.captured import ArithmeticException

    with pytest.raises(ArithmeticException):
        spark.range(1).select(
            F.abs(F.lit(-(2 ** 63)).cast("long"))).head()
    row = spark.range(1).select(
        F.pmod(F.lit(-(2 ** 63)).cast("long"), F.lit(3)).alias("p")).head()
    assert 0 <= row.p < 3     # pmod stays in range
