"""Window/quantile analytics shapes beyond the reference's W1/W2 surface.

Three physical shapes the engine should carry that no existing query
exercises: top-k PER GROUP (row_number + filter — not the global
TakeOrderedAndProject), RANGE-frame time windows (peers by time interval,
not row offsets — a different frame evaluator than moving_average's rows
frame), and exact interpolated quantiles (Spark `percentile` and DuckDB
`quantile_cont` agree bit-for-bit on doubles, so the oracle is exact —
measured, not assumed).

Scale notes: both window queries shuffle once on their partition key;
top-k-per-group filters on row_number so only k rows per group survive
the window stage (never a driver-side collect). The quantile agg is the
one deliberately expensive exact path (global sort of the column) — at
100 TB swap `percentile` for `percentile_approx` and accept the
documented error bound; the query keeps the exact form because it IS the
oracle ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..datasets import load
from ..functions.scalar import fround, fround_sql
from ..queries import query


def topk_per_group(df: DataFrame, group: str, order: str, k: int,
                   tiebreak: str) -> DataFrame:
    """k rows per group by descending `order` (deterministic via
    `tiebreak`) — the row_number window pattern."""
    w = (Window.partitionBy(group)
         .orderBy(F.desc(order), F.col(tiebreak).asc()))
    return (df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k))


@query(
    "topk_orders_per_segment",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice,
           CAST(rn AS INTEGER) AS rn
    FROM (
        SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY c.c_mktsegment
                                  ORDER BY o.o_totalprice DESC,
                                           o.o_orderkey) AS rn
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
)
def topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by total price within every market segment."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    joined = orders.join(F.broadcast(cust),
                         orders.o_custkey == cust.c_custkey)
    return (topk_per_group(joined, "c_mktsegment", "o_totalprice", 3,
                           "o_orderkey")
            .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn"))


_ROLLING_SUM = ("sum(o_totalprice) OVER ("
                "PARTITION BY o_custkey ORDER BY o_orderdate "
                "RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)")


@query(
    "rolling_7day_customer_spend",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderdate,
           {fround_sql(_ROLLING_SUM)} AS spend_7d
    FROM orders
    """,
)
def rolling_7day_customer_spend(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Per-customer trailing-7-day spend — RANGE frame over event time
    (all orders within the interval are peers, however many rows), vs the
    rows-frame moving average which counts rows. Spark range frames need
    a numeric ordering column, so the frame runs over epoch seconds with
    the same inclusive ±bounds DuckDB gives INTERVAL PRECEDING."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.unix_timestamp("o_orderdate"))
         .rangeBetween(-7 * 86400, 0))
    return (orders
            .select("o_orderkey", "o_custkey", "o_orderdate",
                    fround(F.sum("o_totalprice").over(w), 2)
                    .alias("spend_7d")))


@query(
    "price_quantiles",
    oracle="""
    SELECT quantile_cont(l_extendedprice, 0.25) AS q25,
           quantile_cont(l_extendedprice, 0.5) AS q50,
           quantile_cont(l_extendedprice, 0.75) AS q75,
           quantile_cont(l_extendedprice, 0.95) AS q95
    FROM lineitem
    """,
)
def price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated price quantiles (the 100 TB swap is
    percentile_approx; exact kept as the oracle ground truth — Spark
    `percentile` matches DuckDB `quantile_cont` bit-for-bit)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.expr("percentile(l_extendedprice, 0.25)").alias("q25"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("q50"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("q75"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("q95"))
