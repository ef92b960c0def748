"""Skew-handling operators — salted joins and two-stage aggregation.

Beyond-reference engine surface (SURVEY §2.5 "NOT exercised" /
BASELINE.json north star: "design every operator for 100 TB scale").
The reference's only shuffle ops are uniform wordcounts
(`Chapter 6 - Introduction to PySpark.ipynb:251`,
`luigi/wordcount_map_reduce.py:34-39`), so it never hits the failure
mode that dominates real 100 TB runs: one hot key (one language, one
event type, one power-law customer) landing an entire reduce partition
on a single executor while the rest of the cluster idles.

Two standard mitigations, both expressed as plain DataFrame rewrites so
Catalyst/AQE still see through them:

* **Two-stage (salted) aggregation** — append a salt in [0, n), do the
  partial aggregate on (key, salt) — n-way parallel even for a single
  hot key — then re-aggregate the n partials per key. Only algebraic
  aggregates survive the split (sum/count/min/max; avg = sum/count),
  which is exactly Spark's own partial/final contract.
  Cost model: stage-1 shuffle carries the same bytes as the unsalted
  agg (partial aggregation already shrank it); stage 2 shuffles
  |keys|·n tiny rows. Overhead is near-zero, skew ceiling drops n-fold.

* **Salted (replicated) join** — for a shuffled fact⋈dim join where the
  fact side has hot keys but the dim side is too big to broadcast:
  salt each fact row with a value in [0, n) that is NOT a function of
  the join key, replicate every dim row n times (one per salt), and
  join on (key, salt). The hot key's rows now spread over n reduce
  partitions. Dim-side cost: n× replication — use n just large enough
  to cap the largest key (AQE's skew-join split solves the same
  problem for sort-merge joins at runtime; the salted rewrite also
  covers shuffled-hash joins, stream-stream joins, and engines/paths
  where AQE cannot re-plan).

The salt is derived with xxhash64 from a row-unique column when one
exists (deterministic, reproducible plans — required for the oracle
hash-compare) and falls back to `rand(seed)`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..datasets import load
from ..functions.scalar import fround, fround_sql
from ..queries import query

__all__ = [
    "row_salt", "salted_join", "two_stage_agg",
]

DEFAULT_SALTS = 16


def row_salt(n: int, unique_col: str | Column | None = None,
             seed: int = 42) -> Column:
    """A per-row salt in [0, n).

    Deterministic (xxhash64 of a row-unique column) when `unique_col` is
    given; otherwise `rand(seed)` — still reproducible for a fixed seed
    and partitioning, but prefer the hash form wherever a key exists.
    """
    if unique_col is not None:
        c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
        return F.pmod(F.xxhash64(c), F.lit(n)).cast("int")
    return F.floor(F.rand(seed) * n).cast("int")


def salted_join(fact: DataFrame, dim: DataFrame, fact_key: str,
                dim_key: str, n: int = DEFAULT_SALTS,
                salt_unique_col: str | None = None,
                how: str = "inner") -> DataFrame:
    """fact⋈dim equi-join with the fact side salted n ways.

    Replicates `dim` n× via explode(sequence(0, n-1)) — a generator, not
    a driver loop, so the replication happens executor-side after any
    dim-side filters have been pushed down. Result columns = fact ∪ dim
    columns (salt dropped); row multiplicity identical to the plain join.
    """
    salt = row_salt(n, salt_unique_col)
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
    out = f.join(d, (F.col(f"{fact_key}") == F.col(f"{dim_key}"))
                 & (f["_salt"] == d["_salt"]), how)
    return out.drop("_salt")


def two_stage_agg(df: DataFrame, keys: list[str],
                  partial: list[Column], final: list[Column],
                  n: int = DEFAULT_SALTS,
                  salt_unique_col: str | None = None) -> DataFrame:
    """Skew-safe grouped aggregation: partial on (keys, salt), final on keys.

    `partial` aggregates must be algebraic (their results re-aggregate
    to the global answer); `final` expressions reference the partial
    aliases. See `salted_grouped_stats` below for the avg decomposition.
    """
    salted = df.withColumn("_salt", row_salt(n, salt_unique_col))
    part = salted.groupBy(*keys, "_salt").agg(*partial)
    return part.groupBy(*keys).agg(*final)


# ---------------------------------------------------------------------------
# Registered queries — same answers as their unsalted shapes (the point:
# a skew rewrite must be a pure performance transform), so both carry
# ordinary DuckDB oracles and hash-match.
# ---------------------------------------------------------------------------

@query(
    "salted_grouped_stats",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           {fround_sql('avg(value)')} AS avg_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def salted_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped stats over events.event_type via two-stage salted agg.

    event_type has single-digit cardinality — the archetypal hot-key
    grouping (a plain groupBy at 100 TB puts ~1/|types| of ALL rows on
    one reducer). avg is decomposed sum/count so it re-aggregates
    exactly; min/max are idempotent under re-aggregation.
    """
    ev = load(spark, sf_dir, "events")
    return two_stage_agg(
        ev, ["event_type"],
        partial=[
            F.count(F.lit(1)).alias("_cnt"),
            # avg's denominator is count(value) — NON-NULL rows only.
            # Decomposing as sum/count(*) silently counts NULL readings
            # as zeros (adversarial-corpus find); SQL avg skips them.
            F.count("value").alias("_cntv"),
            F.sum("value").alias("_sum"),
            F.min("value").alias("_min"),
            F.max("value").alias("_max"),
        ],
        final=[
            F.sum("_cnt").alias("n_events"),
            fround(F.sum("_sum") / F.sum("_cntv")).alias("avg_value"),
            F.min("_min").alias("min_value"),
            F.max("_max").alias("max_value"),
        ],
        salt_unique_col="event_id",
    )


@query(
    "salted_join_segment_revenue",
    oracle=f"""
    SELECT c.c_mktsegment,
           {fround_sql('sum(o.o_totalprice)')} AS revenue,
           count(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def salted_join_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈customer with the fact side salted 8 ways, then revenue by
    market segment.

    At test scale Catalyst broadcasts the (replicated) customer side and
    the salt is a no-op; at 100 TB with a customer dim past the
    broadcast threshold this exact plan shuffles, and the salt is what
    keeps a power-law customer from pinning one reducer. The salt
    derives from o_orderkey (row-unique), so the plan is deterministic.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(orders, cust, "o_custkey", "c_custkey",
                         n=8, salt_unique_col="o_orderkey")
    return joined.groupBy("c_mktsegment").agg(
        fround(F.sum("o_totalprice")).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
