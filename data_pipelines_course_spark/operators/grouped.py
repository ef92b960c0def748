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


_NANFREE_PRICE = ("CASE WHEN isnan(l_extendedprice) THEN NULL "
                  "ELSE l_extendedprice END")

@query(
    "minmax_scale_by_group",
    # The degenerate group (max == min: single row or constant price)
    # scales to 0.0 — the sklearn MinMaxScaler convention the pandas
    # side implements — NOT the NULL that the raw 0/0 division yields in
    # SQL; `x * 0.0` in the THEN branch keeps a NULL price NULL either
    # way (broken-RI axis, r5: a NULL-returnflag singleton group hit the
    # divergence). The window min/max exclude NaN like the pandas side's
    # skipna (= sklearn's nanmin/nanmax): DuckDB's max otherwise returns
    # NaN as the largest value and poisons the whole group's scale
    # (numeric-extremes axis, r5); a NaN price itself still scales to
    # NaN on both sides.
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CASE WHEN max({_NANFREE_PRICE}) OVER w
                     = min({_NANFREE_PRICE}) OVER w
                THEN l_extendedprice * 0.0
                ELSE {fround_sql(
                    f'(l_extendedprice - min({_NANFREE_PRICE}) OVER w)'
                    f' / (max({_NANFREE_PRICE}) OVER w'
                    f'    - min({_NANFREE_PRICE}) OVER w)', 6)}
           END AS scaled
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
    # Moment aggregates run over the FINITE subset on both sides: one
    # NaN/Inf price otherwise makes DuckDB's stddev raise
    # OutOfRangeException (its M2 accumulator overflows) while Spark
    # degrades to NaN — with the isfinite guard (a no-op on clean data)
    # both engines produce the same finite dispersion, and non-finite
    # values remain visible to the quality gates rather than silently
    # poisoning every profile column (numeric-extremes axis, r5).
    # Percentiles follow the registry NaN->NULL quantile convention.
    oracle=f"""
    SELECT l_returnflag,
           {fround_sql(
               'stddev_samp(CASE WHEN isfinite(l_extendedprice)'
               ' THEN l_extendedprice END)', 4)} AS price_stddev,
           {fround_sql(
               'var_samp(CASE WHEN isfinite(l_extendedprice)'
               ' THEN l_extendedprice END)', 2)} AS price_var,
           {fround_sql('quantile_cont(CASE WHEN NOT isnan(l_quantity)'
                       ' THEN l_quantity END, 0.25)', 4)} AS qty_p25,
           {fround_sql('quantile_cont(CASE WHEN NOT isnan(l_quantity)'
                       ' THEN l_quantity END, 0.5)', 4)} AS qty_median,
           {fround_sql('quantile_cont(CASE WHEN NOT isnan(l_quantity)'
                       ' THEN l_quantity END, 0.75)', 4)} AS qty_p75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def dispersion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance/exact interpolated percentiles per group, each
    over the finite subset (see oracle note). Exact `percentile`
    (sort-based), not percentile_approx — the approx sketch would break
    oracle parity; at 100 TB swap to approx_percentile deliberately and
    re-baseline.

    r12: ONE percentile(col, array(0.25, 0.5, 0.75)) buffer instead of
    three scalar calls (guide §1.2 — the price_quantiles_approx
    single-sketch argument, exact-buffer edition): three independent
    Percentile aggregates each buffered every group row in its own
    sorted map, tripling per-row insert work and per-group agg memory
    for bit-identical output (same buffer, same interpolation). Measured
    0.323 s -> 0.279 s warm at sf0.1 (min-of-7, interleaved, every rep
    below); rows collect-identical; hash_match at 3 SFs. At 100 TB the
    win is the 3x agg-buffer memory, not the local wall."""
    li = load(spark, sf_dir, "lineitem")
    fin_price = F.when(~F.isnan("l_extendedprice")
                       & (F.abs("l_extendedprice") < F.lit(float("inf"))),
                       F.col("l_extendedprice"))
    nanfree_qty = "CASE WHEN NOT isnan(l_quantity) THEN l_quantity END"
    pct = F.expr(f"percentile({nanfree_qty}, array(0.25, 0.5, 0.75))")
    return (li.groupBy("l_returnflag").agg(
        fround(F.stddev_samp(fin_price), 4).alias("price_stddev"),
        fround(F.var_samp(fin_price), 2).alias("price_var"),
        pct.alias("_p"))
        .select("l_returnflag", "price_stddev", "price_var",
                fround(F.col("_p")[0], 4).alias("qty_p25"),
                fround(F.col("_p")[1], 4).alias("qty_median"),
                fround(F.col("_p")[2], 4).alias("qty_p75")))


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


# ---------------------------------------------------------------------------
# Cogrouped-map applyInPandas: per-user click→purchase conversion lag.
# The one UDF family the registry did not yet exercise: TWO tables
# co-partitioned on the same key, each group pair handed to pandas
# together. The imperative core is pd.merge_asof — the per-group as-of
# match that operators/temporal.py expresses natively for the global
# case; here it runs inside the cogroup to showcase the API on semantics
# (nearest-preceding match + per-user reduction) pandas states naturally.
# ---------------------------------------------------------------------------

_CONVERSION_LAG_ORACLE = f"""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    matched AS (
        SELECT p.user_id, p.event_id, p.ts, max(c.ts) AS click_ts
        FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
        GROUP BY 1, 2, 3
    )
    SELECT user_id, count(*) AS n_conv,
           {fround_sql("avg(date_diff('microsecond', click_ts, ts)"
                       " / 1000000.0)", 3)} AS avg_lag_s
    FROM matched GROUP BY user_id
    """


@query("cogroup_conversion_lag", oracle=_CONVERSION_LAG_ORACLE,
       scale_twin="conversion_lag_native")
def cogroup_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user average seconds between each purchase and the latest
    preceding click (purchases with no prior click are not conversions).

    Scale design: cogroup shuffles BOTH event slices once on user_id and
    streams each (clicks, purchases) group pair through Arrow; state is
    bounded by the largest single user (the event_funnel bot caveat
    applies — a 10^7-event user needs pre-capping). The oracle states the
    same nearest-preceding-click match as an inequality join + argmax;
    the pandas side is merge_asof over the two sorted group frames —
    identical semantics, linear per group instead of quadratic."""
    import pandas as pd

    # The two cogroup inputs are built from TWO independent reads, not
    # two filters off one frame: when both sides share lineage (same
    # attribute ids), Spark 4.1.2's cogroup attribute dedup can
    # mis-project the RIGHT side — purchases arrives in the UDF without
    # its `ts` column (reproduced deterministically in
    # tests/test_parity.py::test_cogroup_sides_keep_their_columns;
    # left 2 cols + right 3 cols -> right truncated to 2). Independent
    # scans allocate fresh attribute ids, which sidesteps the rewrite
    # entirely; the physical plan is identical (two pruned scans of the
    # same parquet either way).
    clicks = (load(spark, sf_dir, "events")
              .filter(F.col("event_type") == "click")
              .select("user_id", "ts"))
    purchases = (load(spark, sf_dir, "events")
                 .filter(F.col("event_type") == "purchase")
                 .select("user_id", "event_id", "ts"))

    empty = {"user_id": [], "n_conv": [], "avg_lag_s": []}

    def lag_stats(clicks_pdf: "pd.DataFrame",
                  purch_pdf: "pd.DataFrame") -> "pd.DataFrame":
        import math

        # Loud guard for the lineage-dedup truncation described above:
        # silent column loss must never degrade into a wrong answer.
        missing = ({"user_id", "ts"} - set(clicks_pdf.columns)) | \
            ({"user_id", "event_id", "ts"} - set(purch_pdf.columns))
        if missing:
            raise RuntimeError(
                f"cogroup side lost columns {sorted(missing)} — the "
                "shared-lineage dedup bug; inputs must come from "
                "independent scans")
        if purch_pdf.empty or clicks_pdf.empty:
            return pd.DataFrame(empty)
        cl = clicks_pdf[["ts"]].sort_values("ts")
        cl["click_ts"] = cl["ts"]
        m = (pd.merge_asof(purch_pdf.sort_values("ts"), cl,
                           on="ts", direction="backward")
             .dropna(subset=["click_ts"]))
        if m.empty:
            return pd.DataFrame(empty)
        avg = float((m["ts"] - m["click_ts"]).dt.total_seconds().mean())
        return pd.DataFrame({"user_id": [purch_pdf["user_id"].iloc[0]],
                             "n_conv": [len(m)],
                             "avg_lag_s": [math.floor(avg * 1000 + 0.5)
                                           / 1000]})

    return (clicks.groupBy("user_id")
            .cogroup(purchases.groupBy("user_id"))
            .applyInPandas(lag_stats,
                           "user_id bigint, n_conv bigint, avg_lag_s double"))


@query("conversion_lag_native", oracle=_CONVERSION_LAG_ORACLE)
def conversion_lag_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE twin of cogroup_conversion_lag — same answer, same
    oracle, pure JVM: one filtered scan of the click/purchase rows, one
    window pass per user carries the latest click forward
    (`last(ignorenulls)` over rows preceding), then the per-user
    reduction. One shuffle on
    user_id, whole-stage codegen end to end — measured 0.5 s vs the
    cogroup exemplar's 13.1 s at sf0.1 (the Arrow round-trip per tiny
    group is the cogroup tax; it pays off only when per-group logic is
    genuinely imperative). Ties (click at the purchase timestamp) sort
    kind=click first, matching the oracle's `c.ts <= p.ts`.

    r12: ONE events scan, not two (guide §1.2) — the union of the two
    disjoint event_type filters IS the single `isin` filter, with
    click_ts/kind computed as projections of event_type. Rows are
    identical (disjoint filters cover the same set; the window's
    (ts, kind) sort makes input order irrelevant). Measured 0.339 ->
    0.315 s warm at sf0.1 (min-of-7, interleaved; the variant below the
    old form in 6/7 reps); at 100 TB the event log is read once, not
    twice (plans/r12/conversion_lag_native_{before,after}.txt:
    2 parquet scans -> 1)."""
    from pyspark.sql import Window

    ev = (load(spark, sf_dir, "events")
          .filter(F.col("event_type").isin("click", "purchase"))
          .select("user_id", "ts",
                  F.when(F.col("event_type") == "click", F.col("ts"))
                  .alias("click_ts"),
                  (F.col("event_type") == "purchase").cast("int")
                  .alias("kind")))
    w = (Window.partitionBy("user_id").orderBy("ts", "kind")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    lagged = (ev
              .withColumn("last_click",
                          F.last("click_ts", ignorenulls=True).over(w))
              .filter((F.col("kind") == 1)
                      & F.col("last_click").isNotNull()))
    lag_s = ((F.unix_micros("ts") - F.unix_micros("last_click"))
             / F.lit(1_000_000.0))
    return (lagged.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_conv"),
                 fround(F.avg(lag_s), 3).alias("avg_lag_s")))
