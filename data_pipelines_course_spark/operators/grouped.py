"""Grouped-map pandas operators, dispersion aggregates, pivot.

Reference lineage: the grouped-map shape is SURVEY §2.10 — the per-stock
pandas block inside `get_stock_info` (celery_app/tasks.py:22-32) is
exactly `applyInPandas`: Spark partitions by the group key and hands each
group to a pandas function. The flagship agg (A1) stays native because
Catalyst can express it; this module keeps one *genuine* grouped-map
exemplar for the shapes that need imperative pandas per group.

Dispersion stats and pivot fill SURVEY §2.5's "NOT exercised" row
(stddev/var, grouping-set-style reshapes) — part of the engine surface a
100 TB user expects even though the course never computes them.

Scale notes:
- applyInPandas shuffles once on the group key and streams each group
  through Arrow; memory is bounded by the largest single group, so the
  group key must be low-cardinality-safe (here: 3 return flags over
  ~600k rows/flag at sf0.1 — fine; for billions of rows per group,
  pre-aggregate or salt instead).
- The pivot passes its value list explicitly: `pivot(col)` without values
  triggers an extra distinct-collect job over 100 TB just to learn the
  column set. Never let the planner discover pivot values at scale.
- min-max scaling (not z-score) keeps the oracle comparison exact: min
  and max are order-independent, so `(x - min) / (max - min)` is the
  same IEEE arithmetic on both engines, while a mean/stddev-based score
  would differ in the last ulps by summation order.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..datasets import load
from ..functions.scalar import fround, fround_sql
from ..queries import query

if TYPE_CHECKING:  # pandas is imported on executors at runtime
    import pandas as pd

# ---------------------------------------------------------------------------
# Grouped-map applyInPandas: per-group min-max scaling
# ---------------------------------------------------------------------------

_SCALE_SCHEMA = (
    "l_orderkey bigint, l_linenumber int, l_returnflag string, "
    "scaled double"
)


def _minmax_scale(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Runs once per l_returnflag group, pandas-side (executor)."""
    import numpy as np  # executor-side import

    x = pdf["l_extendedprice"]
    lo, hi = x.min(), x.max()
    out = pdf[["l_orderkey", "l_linenumber", "l_returnflag"]].copy()
    scaled = (x - lo) / (hi - lo) if hi > lo else x * 0.0
    # fround's floor-form half-up, vectorized (same IEEE ops as the oracle)
    out["scaled"] = np.floor(scaled * 1e6 + 0.5) / 1e6
    return out


@query(
    "minmax_scale_by_group",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           {fround_sql('(l_extendedprice - min(l_extendedprice) OVER w)'
                       ' / (max(l_extendedprice) OVER w'
                       '    - min(l_extendedprice) OVER w)', 6)} AS scaled
    FROM lineitem WINDOW w AS (PARTITION BY l_returnflag)
    """,
)
def minmax_scale_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag min-max scaling of extended price as a grouped-map
    pandas stage (the celery per-stock pandas block, distributed)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
    return li.groupBy("l_returnflag").applyInPandas(
        _minmax_scale, schema=_SCALE_SCHEMA)


# ---------------------------------------------------------------------------
# Dispersion aggregates (stddev/var/exact percentiles)
# ---------------------------------------------------------------------------

@query(
    "dispersion_stats",
    oracle=f"""
    SELECT l_returnflag,
           {fround_sql('stddev_samp(l_extendedprice)', 4)} AS price_stddev,
           {fround_sql('var_samp(l_extendedprice)', 2)} AS price_var,
           {fround_sql('quantile_cont(l_quantity, 0.25)', 4)} AS qty_p25,
           {fround_sql('quantile_cont(l_quantity, 0.5)', 4)} AS qty_median,
           {fround_sql('quantile_cont(l_quantity, 0.75)', 4)} AS qty_p75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def dispersion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance/exact interpolated percentiles per group. Exact
    `percentile` (sort-based), not percentile_approx — the approx sketch
    would break oracle parity; at 100 TB swap to approx_percentile
    deliberately and re-baseline."""
    li = load(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag").agg(
        fround(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        fround(F.var_samp("l_extendedprice"), 2).alias("price_var"),
        fround(F.expr("percentile(l_quantity, 0.25)"), 4).alias("qty_p25"),
        fround(F.expr("percentile(l_quantity, 0.5)"), 4).alias("qty_median"),
        fround(F.expr("percentile(l_quantity, 0.75)"), 4).alias("qty_p75"),
    ))


# ---------------------------------------------------------------------------
# Pivot (wide reshape) with explicit values
# ---------------------------------------------------------------------------

_STATUSES = ("O", "F", "P")


@query(
    "pivot_status_counts",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts by priority × status, pivoted wide. Explicit value
    list — no distinct-discovery job."""
    orders = load(spark, sf_dir, "orders")
    piv = (orders.groupBy("o_orderpriority")
           .pivot("o_orderstatus", list(_STATUSES))
           .agg(F.count(F.lit(1))))
    return piv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"status_{s}")
          for s in _STATUSES])
