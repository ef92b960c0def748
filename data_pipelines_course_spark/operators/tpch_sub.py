"""TPC-H shapes Q7/Q8/Q11/Q13/Q15/Q16/Q17/Q20/Q21/Q22 — the
subquery-heavy half of the classic set, adapted to the driver testdata
schema (no partsupp / l_commitdate / l_receiptdate / c_phone /
p_container; see each docstring for the adaptation).

These complete the 22-query classic relational surface next to
`operators/tpch.py`. The structural point of each is the DECORRELATION:
correlated EXISTS / NOT EXISTS / scalar-subquery / IN-chain forms are
expressed as semi/anti joins and pre-aggregates that co-partition with
the main fact join, never as per-row lookups. Every oracle keeps the
subquery in its natural SQL form so DuckDB proves the decorrelated
Spark plan equivalent.

Scale notes (same policy as tpch.py): only fixed-cardinality dims
(nation 25, region 5) carry broadcast hints; supplier/customer/part grow
with SF and are stats/AQE-sized. Single-row scalar aggregates (Q11 total,
Q15 max, Q22 avg) are attached via crossJoin of a 1-row DataFrame —
Catalyst broadcasts a 1-row side regardless of hints, and the alternative
(a window over an empty partitionBy) would funnel the table through one
partition.

Reference lineage: the course never runs multi-table SQL (SURVEY
§2.4/§4.1); this module is the "beyond" relational core the engine needs
to be a drop-in analytics replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..datasets import load, widen_scan
from ..functions.scalar import fround, fround_sql
from ..queries import query

_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "tpch_q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
           {fround_sql(f"sum({_REV})")} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= DATE '1997-01-01'
      AND l.l_shipdate < DATE '1999-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    ORDER BY supp_nation, cust_nation, ship_year
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between a nation PAIR — two
    independent dim chains off the same fact (supplier-side nation and
    customer-side nation) with a symmetric pair predicate. The nation
    filter is pushed through both broadcast joins BEFORE the big
    lineitem⨝orders shuffle wherever Catalyst can (supplier side: it
    can, the filter composes with the broadcast hash join; customer
    side: rides the orders join). At 100 TB the pair predicate is ~2/625
    selective on the supplier dim chain, so filtering supplier/customer
    by nationkey first keeps the big shuffle small."""
    n_pair = ("NATION_3", "NATION_8")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = (nation.filter(F.col("n_name").isin(*n_pair))
          .select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation")))
    n2 = (nation.filter(F.col("n_name").isin(*n_pair))
          .select(F.col("n_nationkey").alias("c_nk"),
                  F.col("n_name").alias("cust_nation")))
    supp = (load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
            .select("s_suppkey", "supp_nation"))
    cust = (load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
            .select("c_custkey", "cust_nation"))
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (load(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1997-01-01")
                  & (F.col("l_shipdate") < "1999-01-01"))
          .select("l_orderkey", "l_suppkey", "l_shipdate",
                  "l_extendedprice", "l_discount"))
    pair_ok = (
        ((F.col("supp_nation") == n_pair[0])
         & (F.col("cust_nation") == n_pair[1]))
        | ((F.col("supp_nation") == n_pair[1])
           & (F.col("cust_nation") == n_pair[0])))
    return (li.join(supp, li.l_suppkey == supp.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .filter(pair_ok)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("ship_year"))
            .agg(fround(F.sum(F.expr(_REV)), 2).alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "ship_year"))


@query(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT ship_year,
           {fround_sql("sum(CASE WHEN supp_nation = 'NATION_6' "
                       "THEN volume ELSE 0 END) / sum(volume)", 4)}
           AS mkt_share
    FROM (
        SELECT CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
               {_REV} AS volume,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region r ON n2.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY ship_year
    ORDER BY ship_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: national market share — one supplier nation's fraction
    of regional revenue for a product type, per year. The conditional
    ratio (CASE inside sum over the SAME rows) folds the inner ALL_NATIONS
    derived table into one aggregate pass; the 7-way join keeps the two
    nation lookups broadcast and lets AQE size part/customer/supplier."""
    nation = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    region = (load(spark, sf_dir, "region")
              .filter(F.col("r_name") == "AMERICA").select("r_regionkey"))
    cust_nat = (nation.join(F.broadcast(region),
                            nation.n_regionkey == region.r_regionkey)
                .select(F.col("n_nationkey").alias("c_nk")))
    cust = (load(spark, sf_dir, "customer")
            .select("c_custkey", "c_nationkey")
            .join(F.broadcast(cust_nat), F.col("c_nationkey") == F.col("c_nk"))
            .select("c_custkey"))
    supp_nat = nation.select(F.col("n_nationkey").alias("s_nk"),
                             F.col("n_name").alias("supp_nation"))
    supp = (load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
            .join(F.broadcast(supp_nat), F.col("s_nationkey") == F.col("s_nk"))
            .select("s_suppkey", "supp_nation"))
    part = (load(spark, sf_dir, "part")
            .filter(F.col("p_type") == "ECONOMY").select("p_partkey"))
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_6", vol).otherwise(0.0)
    return (li.join(part, li.l_partkey == part.p_partkey)
            .join(supp, li.l_suppkey == supp.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy(F.year("l_shipdate").alias("ship_year"))
            .agg(fround(F.sum(target) / F.sum(vol), 4).alias("mkt_share"))
            .orderBy("ship_year"))


@query(
    "tpch_q11_important_parts",
    oracle=f"""
    SELECT l.l_partkey,
           {fround_sql("sum(l.l_extendedprice * l.l_quantity)")} AS value
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE s.s_nationkey = 7
    GROUP BY l.l_partkey
    HAVING sum(l.l_extendedprice * l.l_quantity) > 0.001 * (
        SELECT sum(l2.l_extendedprice * l2.l_quantity)
        FROM lineitem l2 JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
        WHERE s2.s_nationkey = 7)
    ORDER BY value DESC, l.l_partkey
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose stocked value exceeds a FRACTION OF THE
    GLOBAL TOTAL — the uncorrelated scalar-subquery HAVING. Adaptation:
    no partsupp table, so "value" is shipped value (extendedprice ×
    quantity) from one nation's suppliers. Decorrelation: aggregate once
    per part, total the per-part sums (a second tiny aggregate over the
    FIRST aggregate's output, not a second scan), attach the 1-row total
    via crossJoin (broadcast), filter. One scan, two exchanges, no
    re-read of lineitem."""
    supp = (load(spark, sf_dir, "supplier")
            .filter(F.col("s_nationkey") == 7).select("s_suppkey"))
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    val = F.col("l_extendedprice") * F.col("l_quantity")
    per_part = (li.join(supp, li.l_suppkey == supp.s_suppkey)
                .groupBy("l_partkey")
                .agg(F.sum(val).alias("raw_value")))
    total = per_part.agg(
        F.sum("raw_value").alias("total_value"))  # 1 row; broadcast on join
    return (per_part.crossJoin(total)
            .filter(F.col("raw_value") > 0.001 * F.col("total_value"))
            .select("l_partkey", fround(F.col("raw_value"), 2).alias("value"))
            .orderBy(F.desc("value"), "l_partkey"))


@query(
    "tpch_q13_order_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_order_distribution(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Q13 shape: the customer order-count DISTRIBUTION — a left outer
    join that must keep zero-order customers (count(o_orderkey) ignores
    the nulls the outer join manufactures), then a second aggregate over
    the first's output. The filter lives in the JOIN CONDITION, not a
    WHERE (a WHERE would silently turn the outer join inner — the classic
    Q13 trap). First agg shuffles on custkey (uniform); second agg input
    is one row per customer and its key (c_count) has ~tens of distinct
    values, so partial aggregation collapses it map-side."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                                  "o_orderpriority")
    cond = ((cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "4-NOT SPECIFIED"))
    return (cust.join(orders, cond, "left_outer")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("c_count"))
            .groupBy("c_count")
            .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {fround_sql(f"sum({_REV})")} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the top supplier by quarterly revenue — a VIEW (CTE)
    consumed twice: once as the join input, once inside an uncorrelated
    max() scalar subquery. Spark reuses the aggregate by reference (same
    DataFrame object → one computed stage under AQE reuse); the 1-row max
    rides a crossJoin broadcast. Ties all surface, as in the spec."""
    li = (load(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1997-01-01")
                  & (F.col("l_shipdate") < "1997-04-01"))
          .select("l_suppkey", "l_extendedprice", "l_discount"))
    revenue = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(fround(F.sum(F.expr(_REV)), 2).alias("total_revenue")))
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (revenue.crossJoin(max_rev)
            .filter(F.col("total_revenue") == F.col("max_revenue"))
            .join(supp, F.col("supplier_no") == supp.s_suppkey)
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


@query(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#11'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    LIMIT 20
    """,
)
def tpch_q16_supplier_part_counts(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Q16 shape: count-DISTINCT suppliers per part group, minus an
    excluded supplier set (NOT IN subquery → left_anti join; the
    complaint-comment filter is adapted to negative account balance —
    no s_comment column). The anti join runs BEFORE the distinct
    aggregate so excluded suppliers never enter the count; the NOT IN
    is safe to decorrelate because s_suppkey is non-null (a NULL in the
    subquery would make SQL NOT IN return no rows — the Spark anti join
    matches DuckDB's behavior here since keys are non-null)."""
    part = (load(spark, sf_dir, "part")
            .filter((F.col("p_brand") != "Brand#11")
                    & (F.col("p_type") != "PROMO")
                    & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
            .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad_supp = (load(spark, sf_dir, "supplier")
                .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey,
                    "left_anti")
            .join(part, li.l_partkey == part.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").cast("bigint")
                 .alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
            .limit(20)
            .select("p_brand", "p_type", "p_size", "supplier_cnt"))


@query(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    SELECT {fround_sql("sum(l.l_extendedprice) / 7.0")} AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
      AND l.l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Q17 shape: the CORRELATED scalar average — lines whose quantity is
    below 20% of their part's average quantity. Decorrelation: pre-
    aggregate avg(l_quantity) per partkey once, join it back on partkey
    (co-partitioned with the part join), filter. The correlated subquery
    runs over ALL lineitems of the part (not just the brand-filtered
    ones), so the per-part average is computed before the part filter —
    order matters and the oracle proves it. Container filter adapted to
    p_type (no p_container column)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    part = (load(spark, sf_dir, "part")
            .filter((F.col("p_brand") == "Brand#3")
                    & (F.col("p_type") == "SMALL"))
            .select("p_partkey"))
    avg_qty = (li.groupBy(F.col("l_partkey").alias("avg_partkey"))
               .agg((0.2 * F.avg("l_quantity")).alias("qty_cutoff")))
    return (li.join(part, li.l_partkey == part.p_partkey)
            .join(avg_qty, li.l_partkey == avg_qty.avg_partkey)
            .filter(F.col("l_quantity") < F.col("qty_cutoff"))
            .agg(fround(F.sum("l_extendedprice") / 7.0, 2)
                 .alias("avg_yearly"),
                 F.count(F.lit(1)).cast("bigint").alias("n_lines")))


@query(
    "tpch_q20_part_promotion_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l.l_shipdate >= DATE '1997-01-01'
          AND l.l_shipdate < DATE '1998-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING sum(l.l_quantity) > 50)
      AND s.s_nationkey IN (
        SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q20_part_promotion_suppliers(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Q20 shape: the NESTED IN-chain — suppliers who shipped a large
    volume of a filtered part family in a year, restricted to one region.
    Three levels (part-name IN → grouped HAVING IN → nation IN) each
    decorrelate to a semi join: part filter joins into the lineitem
    aggregate; the HAVING output deduplicates to distinct suppkeys;
    supplier left_semi joins both that set and the broadcast nation set.
    Adaptation: availqty > half-of-shipped becomes shipped-volume > 50
    (no partsupp table)."""
    part = (load(spark, sf_dir, "part")
            .filter(F.col("p_name").like("small%")).select("p_partkey"))
    li = (load(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1997-01-01")
                  & (F.col("l_shipdate") < "1998-01-01"))
          .select("l_partkey", "l_suppkey", "l_quantity"))
    big_shippers = (li.join(part, li.l_partkey == part.p_partkey,
                            "left_semi")
                    .groupBy("l_suppkey", "l_partkey")
                    .agg(F.sum("l_quantity").alias("qty"))
                    .filter(F.col("qty") > 50)
                    .select("l_suppkey").distinct())
    asia_nat = (load(spark, sf_dir, "nation")
                .filter(F.col("n_regionkey") == 2).select("n_nationkey"))
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey")
    return (supp.join(big_shippers,
                      supp.s_suppkey == big_shippers.l_suppkey, "left_semi")
            .join(F.broadcast(asia_nat),
                  supp.s_nationkey == asia_nat.n_nationkey, "left_semi")
            .select("s_suppkey", "s_name")
            .orderBy("s_suppkey"))


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Q21 shape: the double correlated EXISTS / NOT EXISTS — suppliers
    who were the SOLE returning supplier on multi-supplier finalized
    orders (late-delivery predicate adapted to l_returnflag = 'R'; no
    l_receiptdate/l_commitdate columns). Decorrelation: ONE order-level
    aggregate computes both existential facts — distinct supplier count
    (EXISTS another supplier ⇔ n_supp > 1) and distinct RETURNING
    supplier count (NOT EXISTS another returning supplier ⇔ n_ret_supp
    = 1, since l1 itself returns) — then joins back on orderkey. Two
    scans of lineitem instead of three correlated probes; both the
    aggregate and the join key on orderkey, so AQE coalesces them onto
    one exchange."""
    # widen_scan (r12): the two-distinct aggregate plans an Expand (2×
    # row multiplication) + two-level partial aggregation, which ran
    # serially inside the single-row-group scan task (guide §2.5); the
    # 3-column projection keeps the widening shuffle narrow. No-op at
    # 100 TB. Measured 1.075 s -> 0.877 s warm at sf0.1 (min-of-7,
    # interleaved); grouped counts are placement-independent.
    li = widen_scan(load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"), "l_orderkey")
    order_stats = (li.groupBy("l_orderkey")
                   .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                        F.countDistinct(
                            F.when(F.col("l_returnflag") == "R",
                                   F.col("l_suppkey")))
                        .alias("n_ret_supp"))
                   .filter((F.col("n_supp") > 1)
                           & (F.col("n_ret_supp") == 1))
                   .select(F.col("l_orderkey").alias("ok")))
    fin_orders = (load(spark, sf_dir, "orders")
                  .filter(F.col("o_orderstatus") == "F")
                  .select("o_orderkey"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (li.filter(F.col("l_returnflag") == "R")
            .join(order_stats, li.l_orderkey == order_stats.ok)
            .join(fin_orders, li.l_orderkey == fin_orders.o_orderkey,
                  "left_semi")
            .join(supp, li.l_suppkey == supp.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(20))


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
           CAST(round(sum(c_acctbal), 2) AS DOUBLE) AS totacctbal
    FROM (
        SELECT substr(c.c_name, length(c.c_name) - 1, 2) AS cntrycode,
               c.c_acctbal
        FROM customer c
        WHERE substr(c.c_name, length(c.c_name) - 1, 2)
              IN ('13', '31', '23', '29', '30', '18', '17')
          AND c.c_acctbal > (
              SELECT avg(c2.c_acctbal) FROM customer c2
              WHERE c2.c_acctbal > 0.0
                AND substr(c2.c_name, length(c2.c_name) - 1, 2)
                    IN ('13', '31', '23', '29', '30', '18', '17'))
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= DATE '2001-01-01')
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def tpch_q22_global_sales_opportunity(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Q22 shape: wealthy customers in target countries with no RECENT
    orders — an uncorrelated scalar avg() threshold PLUS a NOT EXISTS
    anti join (the never-ordered form is empty on this testdata, so the
    anti-join side carries a date filter to keep the result non-trivial).
    Country code adapted to the last two digits of c_name (no c_phone
    column). The avg is computed over the code-filtered
    positive balances, attached via 1-row crossJoin broadcast; the NOT
    EXISTS decorrelates to a left_anti join against orders (probe side
    is the already-thinned customer set, so the anti join's build input
    is the small side after AQE sizing)."""
    codes = ("13", "31", "23", "29", "30", "18", "17")
    code = F.expr("substr(c_name, length(c_name) - 1, 2)")
    cust = (load(spark, sf_dir, "customer")
            .select("c_custkey", "c_acctbal", code.alias("cntrycode"))
            .filter(F.col("cntrycode").isin(*codes)))
    avg_bal = (cust.filter(F.col("c_acctbal") > 0.0)
               .agg(F.avg("c_acctbal").alias("avg_bal")))
    orders = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") >= "2001-01-01")
              .select("o_custkey"))
    return (cust.crossJoin(avg_bal)
            .filter(F.col("c_acctbal") > F.col("avg_bal"))
            .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
            .groupBy("cntrycode")
            .agg(F.count(F.lit(1)).cast("bigint").alias("numcust"),
                 fround(F.sum("c_acctbal"), 2).alias("totacctbal"))
            .orderBy("cntrycode"))


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           {fround_sql("sum(l.l_extendedprice * (1 - l.l_discount)"
                       " - 0.6 * p.p_retailprice * l.l_quantity)")}
               AS sum_profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (product-type profit): per-nation per-year profit on the
    parts matching a name fragment — the 5-way star join over the fact
    table. Adaptation: no partsupp table in this schema, so supply cost
    is a fixed cost ratio of the part's retail price (0.6 ×
    p_retailprice — deterministic, identical on both engines); the
    plan-shape essence of Q9 — lineitem joined to part, supplier,
    nation and orders simultaneously, then a two-key rollup — is
    unchanged. The name filter reaches the part scan (pushdown), part
    and supplier/nation broadcast at test SF by stats (no hints — both
    grow with SF except nation), and the orders join carries only
    (o_orderkey, o_orderdate). One fact scan, one final rollup
    exchange."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity")
    part = (load(spark, sf_dir, "part")
            .filter(F.col("p_name").like("%red%"))
            .select("p_partkey", "p_retailprice"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = F.broadcast(
        load(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.6 * F.col("p_retailprice") * F.col("l_quantity"))
    return (li.join(part, li.l_partkey == part.p_partkey)
            .join(supp, li.l_suppkey == supp.s_suppkey)
            .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(fround(F.sum(profit), 2).alias("sum_profit"))
            .orderBy("nation", F.desc("o_year")))
