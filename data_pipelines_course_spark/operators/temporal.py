"""Temporal joins: as-of (point-in-time) and banded range joins.

Reference lineage: SURVEY §2.4 marks sort-merge/range/as-of/interval joins
"NOT exercised" in kjam/data-pipelines-course — its nearest-neighbor join
(J2, luigi/taxi_data_import.py:129-150, lat/lon → nearest place via a
per-row Google API call) is the closest shape. The engine provides both as
first-class distributed operators, re-expressed on the `events` table
(the taxi/places dims don't exist in testdata; the *operator semantics* —
"match each left row to the nearest/most-recent right row" and "match all
right rows inside a moving range" — are what we preserve).

Scale design (the whole point of these implementations):

- **As-of join = union + window**, NOT a theta join. A naive
  `a JOIN b ON a.key = b.key AND b.ts <= a.ts` explodes to O(|matches|)
  intermediate rows before the per-row max — quadratic on hot keys. The
  union trick is one shuffle (partitionBy key) + one sort (ts): tag both
  sides, interleave, and carry the last-seen right row forward with
  `last(col, ignorenulls=True)`. State per partition is O(1). At 100 TB
  this is the difference between a plan that finishes and one that
  doesn't; skew on a hot key is bounded by that key's own row count,
  never a cross product.

- **Range join = banding**, NOT a theta join. Bucket the time axis at the
  window width, explode each left row to the (two) candidate buckets its
  window overlaps, and equi-join on (key, bucket) before applying the
  exact range predicate. Catalyst gets an equality join key → hash
  shuffle join, no BroadcastNestedLoopJoin. Each right row lives in
  exactly one bucket, so no dedup is needed afterward.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..datasets import load
from ..functions.scalar import fround
from ..queries import query

# ---------------------------------------------------------------------------
# Generic operators (engine API surface)
# ---------------------------------------------------------------------------


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              strict: bool = True) -> DataFrame:
    """For each left row, attach the right row with the greatest
    `right_ts` satisfying `right_ts < left_ts` (strict) or `<=`.

    Right-side payload columns (everything but `on`/`right_ts`) come back
    prefixed `r_`; `right_ts` itself comes back as `r_ts`. Left rows with
    no match keep nulls (left-outer as-of).
    """
    payload = [c for c in right.columns if c not in (on, right_ts)]
    l_tag, r_tag = (0, 1) if strict else (1, 0)
    lhs = left.withColumn("_tag", F.lit(l_tag))
    # The right row travels as ONE struct, carried by ONE
    # last(ignorenulls): per-column last() would resurrect an older
    # row's value wherever the matched row holds a NULL — a chimera row
    # mixing columns from different right rows, diverging from ASOF
    # semantics (review r4). The struct also gives equal-(key, ts) right
    # rows a deterministic winner (greatest struct in the window order)
    # instead of a partition-order-dependent pick; payload types must
    # therefore be orderable (maps are not — project them out first).
    rhs = right.select(
        F.col(on),
        F.struct(
            F.col(right_ts).alias("_rts"),
            *[F.col(c).alias(f"r_{c}") for c in payload],
        ).alias("_r"),
    ).withColumn("_tag", F.lit(r_tag))

    # Interleave on (ts, tag): with strict matching the left row sorts
    # BEFORE a right row carrying the same timestamp, so an equal-ts right
    # row is not yet visible to the running `last()` when the left row is
    # emitted; non-strict flips the tags.
    r_type = rhs.schema["_r"].dataType
    unioned = lhs.select(
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(r_type).alias("_r"),
        "_tag",
    ).unionByName(
        rhs.select(
            *[F.col(c) if c == on
              else F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in left.columns],
            "_r", "_tag",
        )
    )
    order_ts = F.coalesce(F.col("_r")["_rts"], F.col(left_ts))
    w = (Window.partitionBy(on)
         .orderBy(order_ts.asc(), F.col("_tag").asc(), F.col("_r").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.select(
        *left.columns, "_tag",
        F.last("_r", ignorenulls=True).over(w).alias("_last"),
    )
    return (carried.filter(F.col("_tag") == l_tag)
            .select(*left.columns,
                    F.col("_last")["_rts"].alias("r_ts"),
                    *[F.col("_last")[f"r_{c}"].alias(f"r_{c}")
                      for c in payload]))


def banded_range_join(left: DataFrame, right: DataFrame, on: str,
                      left_ts: str, right_ts: str,
                      window_expr: Column,
                      band_micros: int,
                      left_id: str | None = None) -> DataFrame:
    """Equi-join `left` to every right row with
    `left_ts - window <= right_ts < left_ts`, via time-banding.

    `band_micros` must be >= the window width in microseconds so each left
    window overlaps at most two bands. Returns left columns + right
    payload with TRUE left-outer multiplicity: one all-null row per
    unmatched left row, no band artifacts.

    Pass `left_id` (a unique left key) to collapse the band dimension
    exactly; with ``left_id=None`` the RAW banded shape is returned —
    each left row appears once per band, so an unmatched left row emits
    TWO null rows and a matched one still emits a spurious null from its
    empty band (review r4). The raw shape is only correct for consumers
    that aggregate with null-skipping functions over the left key (see
    range_join_click_count), which is also why it is cheaper: the
    collapse costs one window over the joined output."""
    payload = [c for c in right.columns if c not in (on, right_ts)]
    # cast("timestamp") makes the banding expression type-robust: TIMESTAMP
    # passes through, TIMESTAMP_NTZ converts via the (UTC-pinned) session
    # zone — unix_micros itself rejects NTZ input with DATATYPE_MISMATCH.
    band = lambda c: (F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
                      / F.lit(band_micros)).cast("long")
    lhs = left.withColumn(
        "_band",
        F.explode(F.array(band(left_ts) - 1, band(left_ts))))
    rhs = right.select(
        F.col(on).alias("_ron"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in payload],
    ).withColumn("_band", band("r_ts"))
    cond = ((lhs[on] == rhs["_ron"]) & (lhs["_band"] == rhs["_band"])
            & (rhs["r_ts"] >= F.col(left_ts) - window_expr)
            & (rhs["r_ts"] < F.col(left_ts)))
    joined = lhs.join(rhs, cond, "left").drop("_band", "_ron")
    if left_id is None:
        return joined
    wid = Window.partitionBy(left_id)
    rn_w = wid.orderBy(F.col("r_ts").asc_nulls_last())
    return (joined
            .withColumn("_hm", F.max(F.col("r_ts").isNotNull()).over(wid))
            .withColumn("_rn", F.row_number().over(rn_w))
            .filter(F.col("r_ts").isNotNull()
                    | (~F.col("_hm") & (F.col("_rn") == 1)))
            .drop("_hm", "_rn"))


# ---------------------------------------------------------------------------
# Registered queries on `events` (purchase vs click streams)
# ---------------------------------------------------------------------------

@query(
    "asof_join_latest_click",
    oracle="""
    SELECT a.event_id, a.user_id, a.ts,
           b.ts AS r_ts, b.value AS r_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') a
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
      ON a.user_id = b.user_id AND a.ts > b.ts
    """,
)
def asof_join_latest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's most recent strictly-earlier
    click (point-in-time enrichment — J2's nearest-match semantics on the
    time axis)."""
    ev = load(spark, sf_dir, "events")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", "value"))
    return asof_join(purchases, clicks, on="user_id", strict=True)


@query(
    "range_join_click_count",
    oracle="""
    SELECT a.event_id, a.user_id, a.ts, count(b.ts) AS click_cnt
    FROM (SELECT * FROM events WHERE event_type = 'purchase') a
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts < a.ts
    GROUP BY a.event_id, a.user_id, a.ts
    """,
)
def range_join_click_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks per user in the hour before each purchase — a moving-range
    join banded to hour buckets so Catalyst plans a hash join, never a
    nested-loop theta join."""
    ev = load(spark, sf_dir, "events")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts"))
    # left_id=None on purpose: the raw banded shape (band-artifact null
    # rows included) is cheaper, and the null-skipping count() over the
    # purchase key absorbs the artifacts exactly — the generic collapse
    # window would duplicate work this aggregate already does.
    joined = banded_range_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        window_expr=F.expr("INTERVAL 1 HOUR"),
        band_micros=3_600_000_000)
    return (joined.groupBy("event_id", "user_id", "ts")
            .agg(F.count("r_ts").alias("click_cnt")))


# ---------------------------------------------------------------------------
# Batch sessionization — the batch twin of streaming/jobs.py's
# session_windows (event-time sessions with a gap timeout). A training-data
# pipeline sessionizes interaction logs the same way Structured Streaming
# does, but over the full history: one window pass, no state store.
# ---------------------------------------------------------------------------

SESSION_GAP_MIN = 30


def sessionize(events: DataFrame, key: str = "user_id", ts: str = "ts",
               order_tiebreak: str = "event_id",
               gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Assign per-key session sequence numbers: a new session starts when
    the gap since the previous event exceeds `gap_minutes`.

    One shuffle (partitionBy key) + one sort — the classic
    lag → break-flag → running-sum pattern; session ids are dense
    per-key sequences, deterministic because ordering ties are broken by
    `order_tiebreak`. Scale: state is a single window pass; skewed users
    are bounded by their own event counts (no cross product anywhere).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(),
                                        F.col(order_tiebreak).asc())
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(ts).over(w)
    brk = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col(ts).cast("timestamp"))
            - F.unix_micros(prev.cast("timestamp"))) > gap_us),
        F.lit(1)).otherwise(F.lit(0))
    # Derived from the SAME window spec, not re-declared: two copies of
    # the (key, ts, tiebreak) ordering could silently diverge (the
    # scd2_intervals pattern in this file).
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (events
            .withColumn("_brk", brk)
            .withColumn("session_seq", F.sum("_brk").over(cum).cast("long"))
            .drop("_brk"))


@query(
    "sessionize_events",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
        FROM events
    ), b AS (
        SELECT user_id, event_id, ts,
               CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts > INTERVAL '{SESSION_GAP_MIN} minutes'
                    THEN 1 ELSE 0 END AS brk
        FROM o
    ), s AS (
        SELECT user_id, ts,
               CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS session_seq
        FROM b
    )
    SELECT user_id, session_seq,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s
    GROUP BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions over the event log (30-minute inactivity gap)
    with per-session bounds and event counts."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    s = sessionize(ev)
    return (s.groupBy("user_id", "session_seq")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count(F.lit(1)).alias("n_events")))


# ---------------------------------------------------------------------------
# Calendar gap-fill (beyond-reference): dense daily series with explicit
# zero rows for silent days — the resample/reindex shape every time-series
# report needs, built from a sequence() date spine instead of a driver-side
# date loop.
# ---------------------------------------------------------------------------

@query(
    "daily_event_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
        FROM events WHERE event_type = 'purchase'
    ),
    spine AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        FROM bounds
    ),
    daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n_purchases,
               floor(sum(value) * 100 + 0.5) / 100 AS revenue
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    )
    SELECT spine.day,
           coalesce(daily.n_purchases, 0) AS n_purchases,
           coalesce(daily.revenue, 0.0) AS revenue
    FROM spine LEFT JOIN daily ON spine.day = daily.day
    ORDER BY spine.day
    """,
)
def daily_event_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily purchase series: days with no purchases appear as
    explicit zero rows. The date spine is sequence(min_day, max_day)
    exploded FROM THE 1-ROW BOUNDS AGGREGATE — generated distributed,
    never a driver-side date loop — and the daily aggregate left-joins
    onto it. The spine side is tiny (one row per calendar day: ~36k rows
    even for a century), so Catalyst broadcasts the AGGREGATE onto the
    spine or vice versa; either way the only real shuffle is the daily
    groupBy. At 100 TB the pattern holds: the spine is O(days), data-size
    independent."""
    ev = (load(spark, sf_dir, "events")
          .filter(F.col("event_type") == "purchase")
          .select(F.to_date("ts").alias("day"), "value"))
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day"))
    daily = (ev.groupBy("day")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
                  fround(F.sum("value"), 2).alias("revenue")))
    return (spine.join(daily, "day", "left_outer")
            .select("day",
                    F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
                    F.coalesce("revenue", F.lit(0.0)).alias("revenue"))
            .orderBy("day"))


@query(
    "scd2_user_state_intervals",
    oracle="""
    WITH o AS (
        SELECT user_id, event_id, ts, event_type,
               lag(event_type) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
        FROM events),
    runs AS (
        SELECT user_id, ts, event_type,
               CAST(sum(CASE WHEN prev_t IS NULL OR prev_t <> event_type
                             THEN 1 ELSE 0 END) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_seq
        FROM o),
    iv AS (
        SELECT user_id, run_seq, min(event_type) AS state,
               min(ts) AS valid_from,
               CAST(count(*) AS BIGINT) AS n_events
        FROM runs GROUP BY user_id, run_seq)
    SELECT user_id, run_seq, state, valid_from,
           lead(valid_from) OVER
               (PARTITION BY user_id ORDER BY run_seq) AS valid_to,
           lead(valid_from) OVER
               (PARTITION BY user_id ORDER BY run_seq) IS NULL
               AS is_current,
           n_events
    FROM iv
    """,
)
def scd2_user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from an event log: each
    user's consecutive run of identical event_type collapses to one
    validity interval [valid_from, valid_to), open-ended (`is_current`)
    for the latest state — the change-data-capture → dimension-history
    materialization every warehouse ETL needs (reference's closest shape
    is the luigi daily-snapshot append, luigi/top_daily_locations.py;
    this is the at-scale generalization that never rewrites history).

    Plan: run-length encoding via lag + running sum needs ONE shuffle
    (partitionBy user_id); the run aggregate and both lead() windows
    reuse the same user_id partitioning, so Catalyst plans a single
    Exchange followed by sorts — no second shuffle. Ties on ts break on
    event_id for a deterministic oracle hash. Per-user state in every
    window is O(1) (no unbounded collect), so a bot user with 10^7
    events costs sort time, not memory."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type")
    return scd2_intervals(ev)


def scd2_intervals(ev: DataFrame) -> DataFrame:
    """Run-length → validity-interval builder over (user_id, event_id,
    ts, event_type) rows; the reusable core of scd2_user_state_intervals
    (also driven incrementally by streaming.jobs.scd2_maintenance_sink)."""
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = F.when(
        F.lag("event_type").over(order_w).isNull()
        | (F.lag("event_type").over(order_w) != F.col("event_type")),
        1).otherwise(0)
    runs = ev.withColumn(
        "run_seq",
        F.sum(changed).over(
            order_w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint"))
    iv = (runs.groupBy("user_id", "run_seq")
          .agg(F.min("event_type").alias("state"),
               F.min("ts").alias("valid_from"),
               F.count(F.lit(1)).cast("bigint").alias("n_events")))
    seq_w = Window.partitionBy("user_id").orderBy("run_seq")
    valid_to = F.lead("valid_from").over(seq_w)
    return iv.select(
        "user_id", "run_seq", "state", "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
        "n_events")
