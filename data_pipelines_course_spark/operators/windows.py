"""Window / ordered-partition operators — SURVEY §2.7 (W1) plus the
"NOT exercised" window surface (rank/dense_rank/row_number, lag/lead).

Scale note: every window here partitions by a real key (user_id,
c_mktsegment) so state is bounded per partition and the sort is local to
the hash partition — no global sort, no single-reducer bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..datasets import load
from ..functions.scalar import fround
from ..queries import query

# ---------------------------------------------------------------------------
# W1/A9 — first/last value in an ordered partition → period-over-period
# ratio. Reference: (df.ix[-1]['Adj Close']/df.ix[0]['Adj Close'] - 1)*100
# over a date-sorted year of quotes (celery_app/more_tasks.py:30-32).
# Re-expressed per user_id over the events stream, ordered by (ts,
# event_id) — the explicit tie-break makes first/last deterministic.
# ---------------------------------------------------------------------------

@query(
    "window_first_last_ratio",
    oracle="""
    SELECT DISTINCT user_id,
           floor(((last_value(value) OVER w / first_value(value) OVER w - 1)
                 * 100) * 100 + 0.5) / 100 + 0.0 AS pct_change
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 optimization (guide §2.4): the ratio needs ONE row per user —
    # the value at the min and max (ts, event_id) — so the full-frame
    # window + DISTINCT (Exchange→Sort→Window over every event, then a
    # second full-row agg to dedupe) is computed as a plain min_by/max_by
    # aggregation instead: partial aggregation shrinks each scan task to
    # one row per user BEFORE the exchange, the sort disappears, and the
    # dedupe is free (groupBy emits one row per key). (ts, event_id) is
    # the same total order the window used, so the selected values are
    # identical — verified row-identical at sf0.001/0.01/0.1 and vs the
    # unchanged DISTINCT-window oracle. Measured 0.372 s -> 0.293 s warm
    # at sf0.1 interleaved; plan 2 exchanges + Sort + Window -> 1
    # exchange of 1-row-per-user partials (plans/r12/).
    ev = load(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    return (ev.groupBy("user_id")
            .agg((fround((F.max_by("value", key) / F.min_by("value", key)
                          - 1) * 100, 2) + F.lit(0.0)).alias("pct_change")))


# ---------------------------------------------------------------------------
# A10 — range-position compare (reference: |today-high| < |today-low| →
# 'higher'/'lower', celery_app/tasks.py:78-84). Per event_type: is the
# latest value closer to the period high or the period low?
# ---------------------------------------------------------------------------

@query(
    "range_position",
    oracle="""
    WITH lat AS (
        SELECT event_type, value AS latest
        FROM (SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY ts DESC, value DESC) AS rn
              FROM events WHERE value IS NOT NULL)
        WHERE rn = 1),
    agg AS (
        SELECT event_type, max(value) AS hi, min(value) AS lo
        FROM events GROUP BY event_type)
    SELECT a.event_type, hi, lo, latest,
           CASE WHEN abs(latest - hi) < abs(latest - lo)
                THEN 'closer to high' ELSE 'closer to low' END AS position
    FROM agg a LEFT JOIN lat USING (event_type)
    """,
)
def range_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.max("value").alias("hi"),
        F.min("value").alias("lo"),
        # FILTER(value IS NOT NULL): Spark max_by returns the value at
        # the max key even when that value is NULL, while the oracle's
        # arg_max skips NULL arguments — so "latest" means the latest
        # NON-NULL reading on both engines (adversarial-corpus find).
        # The composite (ts, value) key breaks equal-ts ties
        # deterministically on both engines — bare max_by/arg_max are
        # documented partition-order-dependent on ties (review r4).
        F.expr("max_by(value, struct(ts, value))"
               " FILTER (WHERE value IS NOT NULL)")
        .alias("latest"),
    )
    return agg.select(
        "event_type", "hi", "lo", "latest",
        F.when(F.abs(F.col("latest") - F.col("hi"))
               < F.abs(F.col("latest") - F.col("lo")),
               "closer to high").otherwise("closer to low").alias("position"),
    )


# ---------------------------------------------------------------------------
# rank / dense_rank / row_number with frame-deterministic ordering
# (§2.7 "NOT exercised" — engine surface).
# ---------------------------------------------------------------------------

@query(
    "rank_customers",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           CAST(rank() OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           CAST(row_number() OVER w AS INTEGER) AS rn
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), "c_custkey")
    return cust.select(
        "c_mktsegment", "c_custkey", "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    )


# ---------------------------------------------------------------------------
# lag / lead deltas (§2.7 "NOT exercised" — engine surface): per-user
# value delta between consecutive events.
# ---------------------------------------------------------------------------

@query(
    "lag_lead_delta",
    oracle="""
    SELECT user_id, event_id,
           floor((value - lag(value) OVER w) * 100 + 0.5) / 100 + 0.0 AS delta_prev,
           floor((lead(value) OVER w - value) * 100 + 0.5) / 100 + 0.0 AS delta_next
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id",
        (fround(F.col("value") - F.lag("value").over(w), 2) + F.lit(0.0)).alias("delta_prev"),
        (fround(F.lead("value").over(w) - F.col("value"), 2) + F.lit(0.0)).alias("delta_next"),
    )


# ---------------------------------------------------------------------------
# Sliding frame aggregation (engine surface; the Dask sorted-index rolling
# analog of W2): 3-row moving average of value per user.
# ---------------------------------------------------------------------------

# The sum is written as explicit lag() terms rather than avg() OVER a
# rows-frame: engines disagree on windowed-avg accumulation order (DuckDB
# keeps a sliding accumulator, Spark re-sums the frame), which flips
# floor((·) * 100 + 0.5) / 100 at representation boundaries. A fixed left-associated
# (value + lag1) + lag2 is bit-identical everywhere.
@query(
    "moving_average",
    oracle="""
    SELECT user_id, event_id,
           floor(((value + coalesce(lag(value, 1) OVER w, 0)
                        + coalesce(lag(value, 2) OVER w, 0))
                 / (1 + CASE WHEN lag(value, 1) OVER w IS NULL THEN 0 ELSE 1 END
                      + CASE WHEN lag(value, 2) OVER w IS NULL THEN 0 ELSE 1 END)) * 100 + 0.5) / 100 AS ma3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag1 = F.lag("value", 1).over(w)
    lag2 = F.lag("value", 2).over(w)
    total = (F.col("value") + F.coalesce(lag1, F.lit(0))) + F.coalesce(lag2, F.lit(0))
    n = (F.lit(1)
         + F.when(lag1.isNull(), 0).otherwise(1)
         + F.when(lag2.isNull(), 0).otherwise(1))
    return ev.select(
        "user_id", "event_id",
        fround(total / n, 2).alias("ma3"),
    )


# ---------------------------------------------------------------------------
# Distribution-position window pack (§2.7 beyond): ntile / percent_rank /
# cume_dist — the ranking functions the earlier rank query doesn't cover.
# ---------------------------------------------------------------------------

@query(
    "customer_value_deciles",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           CAST(ntile(10) OVER w AS INTEGER) AS decile,
           floor(percent_rank() OVER w * 10000 + 0.5) / 10000 AS pct_rank,
           floor(cume_dist() OVER w * 10000 + 0.5) / 10000 AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-tier assignment per market segment: decile bucket plus the
    two normalized positions (percent_rank, cume_dist). One shuffle on
    the segment key; at 100 TB the per-partition sort is the cost, and
    the 5-segment partitioning is the skew risk — for a truly heavy tier
    job the two-pass approxQuantile cut is the alternative (see
    price_quantiles_approx). Ties break on c_custkey so every engine
    orders identically."""
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), "c_custkey")
    return cust.select(
        "c_mktsegment", "c_custkey",
        F.ntile(10).over(w).cast("int").alias("decile"),
        fround(F.percent_rank().over(w), 4).alias("pct_rank"),
        fround(F.cume_dist().over(w), 4).alias("cume"))
