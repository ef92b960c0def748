"""Classic analytic query shapes (TPC-H-style) over the testdata tables.

The reference never runs multi-table SQL (SURVEY §2.4/§4.1 "NOT
exercised" rows), but an analytics engine's relational core is defined by
these shapes: selective scan+agg (Q6), join + group + top-k (Q3), wide
join + top-k (Q10), conditional aggregation (Q12). Adapted to the columns
the driver testdata actually carries (no o_shippriority / l_shipmode /
l_commitdate), keeping each query's structural point intact.

Scale notes: only FIXED-cardinality dims (nation: 25 rows at every SF)
carry explicit broadcast hints; customer and part grow linearly with SF,
so their join strategy is left to Catalyst size stats / AQE — broadcast
while they fit `spark.sql.autoBroadcastJoinThreshold`, shuffle join
beyond (a hard hint would force a driver OOM at TPC-H-at-100-TB scale).
Fact-fact joins key on l_orderkey/o_orderkey (uniform); date filters
reach the parquet scan (PushedFilters — plan-asserted for Q6); top-k
plans TakeOrderedAndProject (no global sort). Sort tie-breaks include
the group key so LIMIT is deterministic for the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..datasets import load
from ..functions.scalar import fround, fround_sql
from ..queries import query

_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {fround_sql("sum(l_quantity)")} AS sum_qty,
           {fround_sql("sum(l_extendedprice)")} AS sum_base_price,
           {fround_sql(f"sum({_REV})")} AS sum_disc_price,
           {fround_sql(f"sum({_REV} * (1 + l_tax))")} AS sum_charge,
           {fround_sql("avg(l_quantity)", 4)} AS avg_qty,
           {fround_sql("avg(l_extendedprice)", 4)} AS avg_price,
           {fround_sql("avg(l_discount)", 4)} AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1999-12-31'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 shape: the canonical scan + wide multi-aggregate — 8 aggregates
    over one pass, grouped by two low-cardinality flags. The whole query
    is map-side partials + one 6-group exchange; at 100 TB it is purely
    scan-bound, which is the point of the shape."""
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.filter(F.col("l_shipdate") <= "1999-12-31")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(fround(F.sum("l_quantity"), 2).alias("sum_qty"),
                 fround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 fround(F.sum(rev), 2).alias("sum_disc_price"),
                 fround(F.sum(rev * (1 + F.col("l_tax"))), 2)
                 .alias("sum_charge"),
                 fround(F.avg("l_quantity"), 4).alias("avg_qty"),
                 fround(F.avg("l_extendedprice"), 4).alias("avg_price"),
                 fround(F.avg("l_discount"), 4).alias("avg_disc"),
                 F.count(F.lit(1)).cast("bigint").alias("count_order")))


@query(
    "tpch_q3_unshipped_revenue",
    oracle=f"""
    SELECT l.l_orderkey,
           {fround_sql(f"sum({_REV})")} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1998-06-01'
      AND l.l_shipdate > DATE '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: revenue of orders placed but not yet shipped at a cutoff
    date — join + group + deterministic top-10."""
    cust = (load(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") < "1998-06-01")
              .select("o_orderkey", "o_custkey", "o_orderdate"))
    li = (load(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") > "1998-06-01")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey", "o_orderdate")
            .agg(fround(F.sum(F.expr(_REV)), 2).alias("revenue"))
            .orderBy(F.desc("revenue"), "l_orderkey")
            .limit(10)
            .select("l_orderkey", "revenue", "o_orderdate"))


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {fround_sql("sum(l_extendedprice * l_discount)")} AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: pure selective scan + global agg — the pushdown
    showcase (every predicate reaches the parquet scan; plan-asserted)."""
    li = load(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_shipdate") >= "1997-01-01")
                      & (F.col("l_shipdate") < "1998-01-01")
                      & (F.col("l_discount") >= 0.03)
                      & (F.col("l_discount") <= 0.07)
                      & (F.col("l_quantity") < 24))
            .agg(fround(F.sum(F.col("l_extendedprice")
                              * F.col("l_discount")), 2).alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {fround_sql(f"sum({_REV})")} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= DATE '1999-01-01'
      AND o.o_orderdate < DATE '1999-07-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: customers who returned the most revenue in a window —
    wide join + group + top-20."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey")
    orders = (load(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= "1999-01-01")
                      & (F.col("o_orderdate") < "1999-07-01"))
              .select("o_orderkey", "o_custkey"))
    li = (load(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation),
                  cust.c_nationkey == nation.n_nationkey)
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(fround(F.sum(F.expr(_REV)), 2).alias("revenue"))
            .orderBy(F.desc("revenue"), "c_custkey")
            .limit(20)
            .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name"))


@query(
    "tpch_q4_late_shipment_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-01-01'
      AND o.o_orderdate < DATE '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_late_shipment_priority(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS decorrelated to a left_semi join — orders in a
    window with at least one lineitem shipped after the order date,
    counted by priority. The semi join carries the non-equi residual
    (l_shipdate > o_orderdate) on top of the orderkey equi-key, so it
    hash-partitions on orderkey like any equi-join and never expands
    rows (semi join emits each order at most once)."""
    orders = (load(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= "1997-01-01")
                      & (F.col("o_orderdate") < "1997-07-01"))
              .select("o_orderkey", "o_orderdate", "o_orderpriority"))
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (orders.join(
                li, (orders.o_orderkey == li.l_orderkey)
                & (li.l_shipdate > orders.o_orderdate), "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).cast("bigint").alias("order_count")))


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name, {fround_sql(f"sum({_REV})")} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= DATE '1997-01-01'
      AND o.o_orderdate < DATE '1998-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Q5 shape: the 6-way join with the customer-nation = supplier-nation
    correlation — revenue shipped by suppliers to same-nation customers
    within a region and year. lineitem⋈orders is the one big-big shuffle;
    supplier and customer are stats/AQE-sized (no hints — they grow with
    SF); nation and region are fixed-cardinality and hinted. The
    same-nation correlation lands as a residual equality once both dims
    are attached."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    orders = (load(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= "1997-01-01")
                      & (F.col("o_orderdate") < "1998-01-01"))
              .select("o_orderkey", "o_custkey"))
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    region = (load(spark, sf_dir, "region")
              .filter(F.col("r_name") == "ASIA").select("r_regionkey"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(supp, li.l_suppkey == supp.s_suppkey)
            .join(cust, (orders.o_custkey == cust.c_custkey)
                  & (cust.c_nationkey == supp.s_nationkey))
            .join(F.broadcast(nation),
                  supp.s_nationkey == nation.n_nationkey)
            .join(F.broadcast(region),
                  nation.n_regionkey == region.r_regionkey)
            .groupBy("n_name")
            .agg(fround(F.sum(rev), 2).alias("revenue")))


@query(
    "tpch_q18_large_orders",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, {fround_sql("sum(l.l_quantity)")} AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING-subquery decorrelated to an aggregate + semi
    join — orders whose total quantity exceeds a threshold, with their
    customer, top-20 by price. The qualifying-orders aggregate and the
    main lineitem join both key on orderkey, so they share one hash
    partitioning; the qualifier side (few rows after HAVING) is left to
    AQE, which broadcasts it at any realistic selectivity."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("qty"))
           .filter(F.col("qty") > 250)
           .select(F.col("l_orderkey").alias("big_orderkey")))
    return (li.join(big, li.l_orderkey == big.big_orderkey, "left_semi")
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                     "o_totalprice")
            .agg(fround(F.sum("l_quantity"), 2).alias("total_qty"))
            .orderBy(F.desc("o_totalprice"), "o_orderkey")
            .limit(20)
            .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                    "o_totalprice", "total_qty"))


@query(
    "tpch_q12_priority_shipping",
    oracle="""
    SELECT CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY year(l.l_shipdate)
    """,
)
def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional aggregation — per ship-year line counts by
    order-priority class (CASE inside sum, one pass)."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy(F.year("l_shipdate").alias("ship_year"))
            .agg(F.sum(F.when(high, 1).otherwise(0)).cast("bigint")
                 .alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).cast("bigint")
                 .alias("low_line_count")))


@query(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT {fround_sql(f"sum({_REV})")} AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 45)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Q19 shape: an equi-join whose payload predicate is a DISJUNCTION
    of brand/size/quantity clauses — the optimizer stress-test for
    residual-filter placement. Catalyst extracts the common equi-key
    (partkey) for the join and keeps the OR as a post-join filter, while
    the single-side implications it can derive (p_size >= 1, quantity
    ranges' union) are pushed to the scans; part's strategy is
    stats/AQE-chosen (grows with SF)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size")
    j = li.join(part, li.l_partkey == part.p_partkey)
    clause = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#33") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 45)))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (j.filter(clause)
            .agg(fround(F.sum(rev), 2).alias("revenue"),
                 F.count(F.lit(1)).cast("bigint").alias("n_lines")))


@query(
    "tpch_q2_top_acctbal_per_nation",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def tpch_q2_top_acctbal_per_nation(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Q2's structural core: a CORRELATED scalar subquery selecting the
    per-group argmax (the min-cost-supplier pattern, adapted to the
    tables this testdata carries). Spark expresses it as a window max
    over the group + filter — one shuffle on the group key, no
    self-join, no decorrelation surprises; ties all surface, exactly as
    the correlated form does."""
    from pyspark.sql import Window

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    w = Window.partitionBy("c_nationkey")
    top = (cust.withColumn("max_bal", F.max("c_acctbal").over(w))
           .filter(F.col("c_acctbal") == F.col("max_bal")))
    return (top.join(F.broadcast(nation),
                     top.c_nationkey == nation.n_nationkey)
            .select("c_custkey", "c_name", "c_acctbal", "n_name"))


@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT {fround_sql(
        "100.0 * sum(CASE WHEN p.p_type = 'PROMO' "
        "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END) "
        "/ sum(l.l_extendedprice * (1 - l.l_discount))", 4)}
        AS promo_pct,
        CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1997-03-01'
      AND l.l_shipdate < DATE '1997-04-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promotional revenue share for one month — fact⨝dim with
    a conditional ratio in one aggregate (part grows with SF, so its join
    strategy is stats/AQE-chosen, not hinted; the date filter reaches the
    lineitem scan)."""
    li = (load(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1997-03-01")
                  & (F.col("l_shipdate") < "1997-04-01"))
          .select("l_partkey", "l_extendedprice", "l_discount"))
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
    return (li.join(part, li.l_partkey == part.p_partkey)
            .agg(fround(F.lit(100.0) * promo / F.sum(rev), 4)
                 .alias("promo_pct"),
                 F.count(F.lit(1)).cast("bigint").alias("n_lines")))
