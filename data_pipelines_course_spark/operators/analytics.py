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

from ..datasets import load, shuffle_width
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
    # customer grows with SF — no hard broadcast hint; stats/AQE pick the
    # strategy (broadcast while it fits, shuffle join beyond).
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
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
    scale_twin="price_quantiles_approx",
    # NaN -> NULL inside quantile_cont: the engine excludes NaN like
    # NULL (exact_quantiles), and DuckDB's quantile ordering with NaN
    # present is unspecified (its partial sort uses raw < which NaN
    # always fails) — the guard is a no-op on NaN-free data and pins
    # one semantics on hostile data (numeric-extremes axis, r5).
    oracle="""
    SELECT quantile_cont(CASE WHEN isnan(l_extendedprice) THEN NULL
                              ELSE l_extendedprice END, 0.25) AS q25,
           quantile_cont(CASE WHEN isnan(l_extendedprice) THEN NULL
                              ELSE l_extendedprice END, 0.5) AS q50,
           quantile_cont(CASE WHEN isnan(l_extendedprice) THEN NULL
                              ELSE l_extendedprice END, 0.75) AS q75,
           quantile_cont(CASE WHEN isnan(l_extendedprice) THEN NULL
                              ELSE l_extendedprice END, 0.95) AS q95
    FROM lineitem
    """,
)
def price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated price quantiles, computed distributed — the
    de-weakened form (VERDICT r3 #5). The naive `percentile(...)` agg
    funnels every value through ONE ObjectHashAggregate reducer
    (measured 6.9 s at sf0.1 vs 1.1 s for the approx sketch); this
    two-pass rank-lookup keeps exactness with bounded reducers:

      1. range-repartition the values (the parallel-sort shuffle —
         every task sorts one value range; partition sizes bounded by
         maxPartitionBytes, never by data volume);
      2. per-partition counts -> ONE P-row collect gives n AND the
         cumulative offsets (driver-side integer cumsum, re-attached as
         a literal array indexed by pid), so offset + within-partition
         row_number = exact global rank without any global sort on one
         node — and without the old separate count() pass or the
         counts-aggregate + window + broadcast join the stats job used
         to re-derive (r12);
      3. pull the <=8 order statistics the 4 quantiles need and
         interpolate with quantile_cont's formula (lo*(1-f) + hi*f —
         see exact_quantiles for why the algebraic twin is not it).

    Still exact to the last bit vs DuckDB quantile_cont (driver hash
    row + parity test), but the widest stage is an ordinary range
    shuffle — the same cost class as any distributed sort, 100×
    scalable. percentile_approx (price_quantiles_approx) remains the
    cheaper single-narrow-pass swap when ~1e-4 rank error is fine."""
    li = load(spark, sf_dir, "lineitem")
    qs = (0.25, 0.5, 0.75, 0.95)
    got = exact_quantiles(li, "l_extendedprice", qs)
    return spark.createDataFrame(
        [tuple(got[q] for q in qs)],
        "q25 double, q50 double, q75 double, q95 double")


def exact_quantiles(df: DataFrame, col: str,
                    qs: tuple[float, ...]) -> dict[float, float]:
    """Distributed exact quantile_cont over df[col] (nulls excluded) —
    the reusable two-pass rank-based core of price_quantiles."""
    spark = df.sparkSession
    from pyspark.sql import Window

    n_parts = shuffle_width(spark)
    # Cache the range-partitioned values: pid assignment comes from a
    # SAMPLED range partitioner, so the counts branch and the rank
    # branch must see the SAME materialized partitioning (re-evaluating
    # the lazy subtree twice could re-sample different boundaries).
    # NULL and NaN both excluded: quantile_cont (the oracle semantics)
    # skips NaN like NULL, while Spark's sort would rank NaN largest and
    # shift every quantile above it (numeric-extremes axis, r5).
    vals = (df.select(F.col(col).alias("v"))
            .filter(F.col("v").isNotNull() & ~F.isnan(F.col("v")))
            .repartitionByRange(n_parts, "v")
            .withColumn("pid", F.spark_partition_id())
            .persist())
    try:
        # ONE P-row collect supplies BOTH n and the per-partition rank
        # offsets (r12 continuation, guide §1.2 "don't compute things
        # you throw away"): the old form ran count() as its own pass and
        # then re-derived the same per-pid counts INSIDE the stats job
        # (aggregate + single-partition window + broadcast join), i.e.
        # three passes over the cached values and two driver-visible
        # jobs whose first threw away the breakdown the second needed.
        # n = sum(cnt) is exactly count(); the cumulative offsets are
        # integer arithmetic over <=P rows, computed driver-side (same
        # "P rows: the only driver-adjacent state" bound as before) and
        # re-attached as a LITERAL array indexed by pid — the stats job
        # loses the counts aggregate, the window and the join outright.
        # Measured 1.881 -> 1.523 s construction+collect at sf0.1
        # (min-of-7, interleaved; cold 5.6 -> 2.3 s); values identical
        # (plans/r12/price_quantiles_rankpass_{before,after}.txt).
        cnt_rows = (vals.groupBy("pid")
                    .agg(F.count(F.lit(1)).alias("cnt")).collect())
        n = sum(r["cnt"] for r in cnt_rows)
        if n == 0:
            return {q: None for q in qs}
        offs = [0] * n_parts
        acc = 0
        for row in sorted(cnt_rows, key=lambda r: r["pid"]):
            offs[row["pid"]] = acc
            acc += row["cnt"]
        # quantile_cont rank arithmetic (0-indexed): pos = q*(n-1);
        # need order statistics floor(pos) and ceil(pos), 1-indexed.
        need: set[int] = set()
        pos = {}
        for q in qs:
            p = q * (n - 1)
            pos[q] = p
            need.add(int(p) + 1)
            need.add(min(int(p) + 2, n))
        rank_w = Window.partitionBy("pid").orderBy("v")
        # long literals: global ranks overflow int32 beyond ~2e9 rows.
        off_col = F.element_at(
            F.array(*[F.lit(o).cast("long") for o in offs]),
            F.col("pid") + 1)
        stats = (vals.withColumn("r", F.row_number().over(rank_w)
                                 + off_col)
                 .filter(F.col("r").isin(*need))
                 .select("r", "v").collect())
        by_rank = {int(row["r"]): float(row["v"]) for row in stats}
        out = {}
        for q in qs:
            p = pos[q]
            lo = by_rank[int(p) + 1]
            hi = by_rank[min(int(p) + 2, n)]
            f = p - int(p)
            # lo*(1-f) + hi*f, NOT lo + f*(hi-lo): the two differ by an
            # ulp on some inputs and DuckDB quantile_cont (the oracle)
            # computes the former — property-tested on adversarial value
            # sets in tests/test_functions.py. Integral rank short-
            # circuits to lo exactly as DuckDB does: computing hi*0
            # would turn a +-Inf next-order-statistic into NaN
            # (numeric-extremes axis, r5).
            out[q] = lo if f == 0 else lo * (1 - f) + hi * f
        return out
    finally:
        vals.unpersist()


@query("price_quantiles_approx")  # rows-only: sketch values differ from
#                                   DuckDB's approx_quantile sketch
def price_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for price_quantiles, registered as a first-class
    query (not just a test note): percentile_approx's KLL-like sketch
    merges map-side, so the aggregate is one narrow shuffle of constant-
    size sketches instead of funneling every value through a single
    ObjectHashAggregate reducer. Accuracy 10000 ⇒ rank error ≤ 1/10000;
    tests/test_functions.py asserts <1% relative error against the exact
    twin on the real corpus. No SQL oracle: DuckDB's approx_quantile is
    a different sketch with different (valid) outputs — the exact twin
    price_quantiles IS the ground truth the driver hash-checks.

    r12 optimization (guide §1.2 "don't compute things you throw
    away"): the original form called percentile_approx once PER
    quantile — four independent ApproximatePercentile buffers each
    ingesting every row, i.e. 4× the per-row sketch-update work for
    four copies of the SAME sketch (same values, same order, same
    accuracy ⇒ identical state). One call with an array of percentages
    builds the sketch once and reads four order statistics out of it,
    so the outputs are bit-identical to the four-agg form (verified by
    collect-compare at sf0.1 and pinned by test). Measured 0.889 s ->
    0.311 s warm at sf0.1 (min-of-7, interleaved); plan: 4
    ObjectHashAggregate buffers -> 1."""
    li = load(spark, sf_dir, "lineitem")
    acc = 10000
    qs = (0.25, 0.5, 0.75, 0.95)
    arr = ", ".join(f"{q}D" for q in qs)
    return (li.agg(F.expr(
                f"percentile_approx(l_extendedprice, array({arr}), {acc})")
            .alias("qs"))
            .select(*[F.col("qs").getItem(i).alias(f"q{int(q * 100)}")
                      for i, q in enumerate(qs)]))


# ---------------------------------------------------------------------------
# Event analytics: funnel and cohort retention — the two canonical
# product-analytics shapes over an event stream, built from conditional
# aggregation plus user_id-co-partitioned stage joins (bounded state;
# no per-user event arrays anywhere).
# ---------------------------------------------------------------------------

@query(
    "event_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t_view
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
        GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS viewed,
           (SELECT CAST(count(*) AS BIGINT) FROM s2) AS clicked_after_view,
           (SELECT CAST(count(*) AS BIGINT) FROM s3) AS purchased_after_click
    """,
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view → click → purchase funnel: each stage counts users
    whose stage event happens strictly AFTER their previous stage's first
    event.

    Staged conditional-min: each stage is filter → join previous stage →
    min aggregate. Per-group state is ONE timestamp (a running min) at
    every stage — never a per-user event array, so a bot user with 10^7
    events costs its tasks nothing beyond the scan (the r2 collect_list
    formulation buffered every click/purchase per user and would OOM a
    task on such a key). Every shuffle keys on user_id, so the stage
    joins co-partition with the aggregates; the three final counts are
    single-row and cross-joined for free."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    views = (ev.filter(F.col("event_type") == "view")
             .groupBy("user_id").agg(F.min("ts").alias("t_view")))
    clicks = (ev.filter(F.col("event_type") == "click")
              .join(views, "user_id")
              .filter(F.col("ts") > F.col("t_view"))
              .groupBy("user_id").agg(F.min("ts").alias("t_click")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .join(clicks.select("user_id", "t_click"), "user_id")
                 .filter(F.col("ts") > F.col("t_click"))
                 .groupBy("user_id").agg(F.min("ts").alias("t_purchase")))
    v = views.agg(F.count("t_view").cast("bigint").alias("viewed"))
    c = clicks.agg(F.count("t_click").cast("bigint")
                   .alias("clicked_after_view"))
    p = purchases.agg(F.count("t_purchase").cast("bigint")
                      .alias("purchased_after_click"))
    return v.crossJoin(c).crossJoin(p)


@query(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
        -- positive modulo, NOT bare %: both engines' % takes the
        -- dividend's sign, so a first event BEFORE the anchor would
        -- snap its cohort week FORWARD past the event (epoch axis r5)
        SELECT user_id, CAST(min(ts) AS DATE)
               - CAST(((CAST(min(ts) AS DATE) - DATE '2024-01-01') % 7
                       + 7) % 7 AS INTEGER) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST((CAST(e.ts AS DATE) - f.cohort_week) // 7 AS INTEGER)
                   AS week_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset,
           CAST(count(*) AS BIGINT) AS active_users
    FROM activity GROUP BY cohort_week, week_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week
    (weeks anchored at 2024-01-01), counted once per later week they
    return. The per-user first-event aggregate is UNBOUNDED (one row per
    user), so it must never carry a broadcast hint — the join back onto
    the event scan keys on user_id, the same key as the aggregate's
    shuffle, so both sides co-partition and the join adds no exchange
    beyond the one the groupBy already paid."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    anchor = F.to_date(F.lit("2024-01-01"))
    # pmod, not %: % takes the dividend's sign, so a first event BEFORE
    # the anchor date snapped its cohort week FORWARD past the event —
    # the user's own first week then computed as offset -1 (Spark floor)
    # or merged into week 0 (DuckDB truncating //). Backward snapping
    # makes the first event week 0 by construction, after which floor
    # and truncation agree (offsets are non-negative). Epoch axis r5.
    first = (ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
             .select("user_id",
                     F.date_sub(F.to_date("first_ts"),
                                F.pmod(F.datediff(F.to_date("first_ts"),
                                                  anchor), F.lit(7)))
                     .alias("cohort_week")))
    activity = (ev.join(first, "user_id")
                .select("user_id", "cohort_week",
                        F.floor(F.datediff(F.to_date("ts"),
                                           F.col("cohort_week")) / 7)
                        .cast("int").alias("week_offset"))
                .distinct())
    return (activity.groupBy("cohort_week", "week_offset")
            .agg(F.count(F.lit(1)).cast("bigint").alias("active_users")))


@query(
    "quantity_quantiles_by_flag",
    scale_twin="quantity_quantiles_by_flag_approx",
    # NaN -> NULL on both sides (registry quantile convention, see
    # price_quantiles): Spark's percentile ranks NaN largest, DuckDB's
    # NaN quantile ordering is unspecified. On NaN-free data the guard
    # is a no-op; on hostile data it can otherwise agree only by luck
    # (duplicated quantities absorb the one-rank shift).
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CASE WHEN isnan(l_quantity) THEN NULL
                              ELSE l_quantity END, 0.5) AS median_qty,
           quantile_cont(CASE WHEN isnan(l_quantity) THEN NULL
                              ELSE l_quantity END, 0.9) AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def quantity_quantiles_by_flag(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """GROUPED exact quantiles — per-group sort inside the aggregate.
    Each group's cost is bounded by its own rows (better than the old
    global price_quantiles), but with 3 return flags each reducer still
    swallows a third of the corpus at 100 TB — deliberate ground truth;
    the registered scale twin is the per-group sketch below."""
    li = load(spark, sf_dir, "lineitem")
    nanfree = "CASE WHEN isnan(l_quantity) THEN NULL ELSE l_quantity END"
    return (li.groupBy("l_returnflag")
            .agg(F.expr(f"percentile({nanfree}, 0.5)").alias("median_qty"),
                 F.expr(f"percentile({nanfree}, 0.9)").alias("p90_qty")))


@query("quantity_quantiles_by_flag_approx")  # rows-only: sketch values
#                                              differ from DuckDB's sketch
def quantity_quantiles_by_flag_approx(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """The 100 TB path for grouped quantiles: percentile_approx sketches
    merge map-side, so each group's reducer receives a constant-size
    sketch per map task instead of every row — group size stops
    mattering. Same accuracy contract as price_quantiles_approx
    (rank error <= 1/10000); the exact twin is the driver-checked
    ground truth.

    Regime note (VERDICT r6): the sketch's value is per-key-CARDINALITY
    blowup (millions of groups, where per-group exact sort state
    explodes), NOT this 3-group shape — TWIN_BENCH_r06 measured the
    exact twin WINNING at sf1 (0.35 s vs 3.10 s, and the sketch's
    per-decade slope is the steeper one here because sketch-merge
    overhead dominates when groups are this few and this large). The
    twin tag is kept for the regime argument, not a same-shape win.

    r12: ONE percentile_approx(col, array(0.5, 0.9), acc) sketch
    instead of two (guide §1.2 — the price_quantiles_approx
    single-sketch change, same module): both aggregates built the
    identical buffer (same values, same order, same accuracy), doubling
    per-row sketch-update work for bit-identical output. Measured
    0.420 s -> 0.298 s warm at sf0.1 (min-of-7, interleaved); rows
    collect-identical."""
    li = load(spark, sf_dir, "lineitem")
    acc = 10000
    return (li.groupBy("l_returnflag")
            .agg(F.expr(f"percentile_approx(l_quantity, array(0.5, 0.9),"
                        f" {acc})").alias("_p"))
            .select("l_returnflag",
                    F.col("_p")[0].alias("median_qty"),
                    F.col("_p")[1].alias("p90_qty")))
