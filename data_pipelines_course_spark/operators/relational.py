"""Batch relational core: scans, filters, projections, aggregations, sorts,
joins, set ops — SURVEY §2.3-§2.6 plus the §2 "NOT exercised" additions
(distinct, rollup/cube, semi/anti joins) required for the full engine
surface.

Every query is declarative DataFrame API: Catalyst gets the whole plan, so
predicate pushdown, column pruning, partial aggregation and join-strategy
selection are automatic (SURVEY §4.1 — the reference did each of these by
hand exactly once; here they are free everywhere).

Scale notes are attached per-query where the local plan differs from the
1000-executor plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..datasets import load, register_views, widen_scan
from ..functions.scalar import fround, fround_portable_sql
from ..queries import query

# ---------------------------------------------------------------------------
# A1 — flagship grouped multi-column multi-function aggregation.
# Reference semantics: celery_app/tasks.py:24-31 — groupby('Stock').agg(
# {col: [min,max,mean,median] for 5 OHLC cols}) then MultiIndex flattened to
# "<col> <fn>" (asserted by celery_app/test_stock_tasks.py:17-22).
# Re-expressed on lineitem with l_returnflag as the grouping key.
# Scale: single hash-aggregate, partial+final split by Catalyst; median is
# exact (full sort per group-col, still shuffle-bounded). avg rounded 2dp —
# double summation order is nondeterministic across partitions.
# ---------------------------------------------------------------------------

_FLAGSHIP_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _flagship_aggs():
    aggs = []
    for c in _FLAGSHIP_COLS:
        aggs.append(F.min(c).alias(f"{c} min"))
        aggs.append(F.max(c).alias(f"{c} max"))
        aggs.append(fround(F.avg(c), 2).alias(f"{c} mean"))
        # Median excludes NaN like NULL (the registry's quantile
        # convention, exact_quantiles): Spark's median ranks NaN
        # largest while DuckDB's NaN quantile ordering is unspecified
        # (numeric-extremes axis, r5) — NaN->NULL pins one semantics
        # on both engines. min/max/avg need no wrap: both engines
        # already agree there (max -> NaN, avg -> NaN).
        aggs.append(
            F.median(F.when(~F.isnan(c), F.col(c))).alias(f"{c} median"))
    return aggs


_FLAGSHIP_ORACLE_COLS = ", ".join(
    f'min({c}) AS "{c} min", max({c}) AS "{c} max", '
    f'floor((avg({c})) * 100 + 0.5) / 100 AS "{c} mean", '
    f'median(CASE WHEN isnan({c}) THEN NULL ELSE {c} END) AS "{c} median"'
    for c in _FLAGSHIP_COLS
)


@query(
    "flagship_grouped_agg",
    oracle=f"""
    SELECT l_returnflag, {_FLAGSHIP_ORACLE_COLS}
    FROM lineitem GROUP BY l_returnflag
    """,
)
def flagship_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen_scan (r12): the four exact-percentile partial aggregates are
    # the engine's heaviest map-side work (l_extendedprice alone carries
    # ~583k distinct values into an OpenHashMap buffer per task); on the
    # single-row-group local files that ran serially in the one scan
    # task. Measured 1.47 s -> 1.05 s warm at sf0.1 (quiet machine,
    # min-of-5); values identical (medians are placement-exact, the 2dp
    # mean rounding already absorbs partial-sum reordering — docstring
    # above). No-op at 100 TB (inputFiles >= target ⇒ pass-through).
    # Widen key = l_extendedprice, a column the aggregate already needs
    # (guide §2.3, project before the exchange): keying on l_orderkey
    # read + shuffled a 6th column only to be dropped after the
    # exchange. ~583k distinct doubles spread the 32-way hash evenly and
    # the key is a real column, so retried map tasks repartition
    # identically (SPARK-38388). Measured 1.115 s -> 0.889 s warm at
    # sf0.1 (min-of-7, interleaved); ReadSchema 6 -> 5 columns
    # (plans/r12/flagship_grouped_agg_{before,after}.txt).
    li = widen_scan(load(spark, sf_dir, "lineitem"), "l_extendedprice")
    return li.groupBy("l_returnflag").agg(*_flagship_aggs())


# ---------------------------------------------------------------------------
# P1 — substring filter (reference: 'Deutschland' in line,
# Chapter 6 - Introduction to PySpark.ipynb:130).
# Scale: predicate pushes to the parquet scan; only 3 columns read.
# ---------------------------------------------------------------------------

@query(
    "filter_contains",
    oracle="""
    SELECT doc_id, lang, source FROM documents WHERE text LIKE '%spark%'
    """,
)
def filter_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.filter(F.col("text").contains("spark")).select(
        "doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# P2 — equality predicate on a field (reference: x['type']=='PushEvent',
# Chapter 4 - Learning Dask Bags.ipynb:82).
# ---------------------------------------------------------------------------

@query(
    "filter_equality",
    oracle="""
    SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
    """,
)
def filter_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value")


# ---------------------------------------------------------------------------
# P3 — date-window + NOT NULL predicate (reference SQL pushed into SQLite:
# airflow/dags/twitter_airflow.py:132-134). Fixed literal cutoff keeps the
# query deterministic (the reference's date('now') is wall-clock-relative).
# ---------------------------------------------------------------------------

@query(
    "filter_date_window",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_orderdate > TIMESTAMP '2000-01-01 00:00:00'
      AND o_orderpriority IS NOT NULL
    """,
)
def filter_date_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderdate") > F.lit("2000-01-01 00:00:00").cast("timestamp"))
        & F.col("o_orderpriority").isNotNull()
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")


# ---------------------------------------------------------------------------
# P5 — field projection / pluck (reference: db.pluck('type'),
# Chapter 4 - Learning Dask Bags.ipynb:73). Duplicates preserved.
# ---------------------------------------------------------------------------

@query("projection_pluck", oracle="SELECT event_type FROM events")
def projection_pluck(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select("event_type")


# ---------------------------------------------------------------------------
# P7/F9-F11 — derived datetime parts (reference: Extras...ipynb:107-140 —
# DateTime/Hour/DayOfWeek/Date columns). DayOfWeek keeps the PYTHON
# convention Monday=0 (reference uses d.weekday()); Spark's weekday()
# matches it directly, DuckDB via isodow()-1. ISO formatting per
# airflow/dags/twitter_airflow.py:49 isoformat().
# ---------------------------------------------------------------------------

@query(
    "derived_datetime_parts",
    oracle="""
    SELECT event_id,
           CAST(hour(ts) AS INTEGER) AS hour,
           CAST(isodow(ts) - 1 AS INTEGER) AS dow_py,
           CAST(ts AS DATE) AS event_date,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso_ts
    FROM events
    """,
)
def derived_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.hour("ts").alias("hour"),
        F.weekday("ts").alias("dow_py"),
        F.to_date("ts").alias("event_date"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("iso_ts"),
    )


# ---------------------------------------------------------------------------
# P8/P10 — literal column + type cast (reference: df['Stock']=stock,
# celery_app/tasks.py:23; .astype(int), First Steps with Dask.ipynb:609).
# ---------------------------------------------------------------------------

@query(
    "literal_and_cast",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'LINEITEM' AS src,
           CAST(l_quantity AS INTEGER) AS qty_int
    FROM lineitem
    """,
)
def literal_and_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.lit("LINEITEM").alias("src"),
        F.col("l_quantity").cast("int").alias("qty_int"),
    )


# ---------------------------------------------------------------------------
# A2/A3 — global min/max/mean + count (reference: df['Adj Close'].max()/
# .mean()/.min(), celery_app/tasks.py:60-62; rdd.count()).
# ---------------------------------------------------------------------------

@query(
    "global_minmax",
    oracle="""
    SELECT min(l_extendedprice) AS price_min,
           max(l_extendedprice) AS price_max,
           floor((avg(l_extendedprice)) * 100 + 0.5) / 100 AS price_mean,
           count(*) AS cnt
    FROM lineitem
    """,
)
def global_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.min("l_extendedprice").alias("price_min"),
        F.max("l_extendedprice").alias("price_max"),
        fround(F.avg("l_extendedprice"), 2).alias("price_mean"),
        F.count(F.lit(1)).alias("cnt"),
    )


# ---------------------------------------------------------------------------
# A4 — grouped count (reference: groupby('DayOfWeek').count(),
# First Steps with Dask.ipynb:510-563).
# ---------------------------------------------------------------------------

@query(
    "grouped_count",
    oracle="""
    SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY o_orderpriority
    """,
)
def grouped_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("cnt")))


# ---------------------------------------------------------------------------
# A5 — value_counts / frequencies (reference: pluck('type').frequencies(),
# Learning Dask Bags.ipynb:73; Hour.value_counts()).
# ---------------------------------------------------------------------------

@query(
    "value_counts",
    oracle="""
    SELECT event_type, count(*) AS cnt FROM events
    GROUP BY event_type ORDER BY cnt DESC, event_type
    """,
)
def value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), "event_type"))


# ---------------------------------------------------------------------------
# A6/F1/F2/F5 — word count (reference: flatMap(split).map((w,1))
# .reduceByKey(add), Chapter 6 - Introduction to PySpark.ipynb:251; regex
# tokenizer re.findall('\\w+', s) at :348; lowercase Learning Dask
# Bags.ipynb:120). explode(split) keeps tokenization JVM-side; Catalyst's
# partial aggregation replaces the manual reduceByKey combiner.
# ---------------------------------------------------------------------------

def _tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return (df
            .select(F.explode(F.split(F.lower(F.col(text_col)), r"\W+"))
                    .alias("word"))
            .filter(F.col("word") != ""))


_WORDCOUNT_ORACLE = """
    SELECT word, count(*) AS cnt FROM (
        SELECT unnest(string_split_regex(lower(text), '\\W+')) AS word
        FROM documents
    ) WHERE word <> '' GROUP BY word
"""


@query("wordcount", oracle=_WORDCOUNT_ORACLE)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return _tokens(docs).groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


# ---------------------------------------------------------------------------
# A7 — partial+final aggregation with explicit combiner (reference: foldby
# over commit counts per hour, Learning Dask Bags.ipynb:97). Catalyst's
# HashAggregate does the partial/final split automatically (SURVEY §4.1).
# ---------------------------------------------------------------------------

@query(
    "grouped_hour_sum",
    oracle="""
    SELECT CAST(hour(ts) AS INTEGER) AS hour,
           floor((sum(value)) * 100 + 0.5) / 100 AS total,
           count(*) AS cnt
    FROM events GROUP BY 1
    """,
)
def grouped_hour_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (ev.groupBy(F.hour("ts").alias("hour"))
            .agg(fround(F.sum("value"), 2).alias("total"),
                 F.count(F.lit(1)).alias("cnt")))


# ---------------------------------------------------------------------------
# O2 — top-k by count (reference: .top(10) / topk(10, key=count) /
# most_common(5)). Spark plans TakeOrderedAndProject — no global sort.
# Tie-break on word so the k-th row is deterministic vs the oracle.
# ---------------------------------------------------------------------------

@query(
    "topk_words",
    oracle=f"""
    SELECT word, cnt FROM ({_WORDCOUNT_ORACLE})
    ORDER BY cnt DESC, word LIMIT 10
    """,
)
def topk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = wordcount(spark, sf_dir)
    return counts.orderBy(F.desc("cnt"), "word").limit(10)


# ---------------------------------------------------------------------------
# O1 — sort by computed key (reference: pairs.sortBy(lambda k: k[1]),
# PySpark.ipynb:326; sorted(results, key=...) celery_app/tasks.py:101-110).
# ---------------------------------------------------------------------------

@query(
    "sort_by_computed",
    oracle="""
    SELECT c_custkey, c_name, floor((abs(c_acctbal)) * 100 + 0.5) / 100 AS abs_bal
    FROM customer ORDER BY abs_bal DESC, c_custkey LIMIT 100
    """,
)
def sort_by_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return (cust.select("c_custkey", "c_name",
                        fround(F.abs("c_acctbal"), 2).alias("abs_bal"))
            .orderBy(F.desc("abs_bal"), "c_custkey")
            .limit(100))


# ---------------------------------------------------------------------------
# O5 — tail slice (reference: my_df[-40:] after sort, PySpark.ipynb:392).
# Expressed as top-40-descending; order-insensitive hash makes re-sorting
# ascending equivalent.
# ---------------------------------------------------------------------------

@query(
    "tail_slice",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey DESC LIMIT 40
    """,
)
def tail_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_totalprice")
            .orderBy(F.desc("o_orderkey"))
            .limit(40))


# ---------------------------------------------------------------------------
# J3 — UNION ALL, duplicates preserved (reference: RDD union keeps the
# overlap — 890 rows incl. dups, PySpark.ipynb:185-229).
# ---------------------------------------------------------------------------

@query(
    "union_all",
    oracle="""
    SELECT event_id, event_type, value FROM events WHERE event_type = 'error'
    UNION ALL
    SELECT event_id, event_type, value FROM events WHERE value > 150
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.filter(F.col("event_type") == "error").unionAll(
        ev.filter(F.col("value") > 150))


# ---------------------------------------------------------------------------
# J1 — broadcast equi-join (reference: per-city dict merge of current ⋈
# forecast, Dask Distributed.ipynb:122-146). customer is the smaller side
# but GROWS with SF — no hard F.broadcast hint (a hint bypasses AQE's size
# check and forces an OOM broadcast at 100 TB). Catalyst's size stats /
# AQE pick BroadcastHashJoin while customer fits the threshold and fall
# back to shuffle join when it doesn't; test_plans asserts the stats-based
# broadcast fires at test SF with no hint present.
# ---------------------------------------------------------------------------

@query(
    "broadcast_join",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment")
    return (orders.join(cust, orders.o_custkey == cust.c_custkey)
            .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment"))


# ---------------------------------------------------------------------------
# Multi-way join + grouped revenue (beyond-reference engine surface; the
# TPC-H Q5 shape). Scale: lineitem⋈orders is the only big-big join (sort-
# merge / shuffle on orderkey); nation/region are FIXED-cardinality dims
# (25/5 rows at every SF) so they carry explicit broadcast hints; customer
# grows with SF so its strategy is left to size stats / AQE — broadcast
# while it fits, shuffle join beyond, never a forced OOM.
# ---------------------------------------------------------------------------

@query(
    "join_multiway_revenue",
    oracle="""
    SELECT n.n_name,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue,
           count(*) AS line_cnt
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    """,
)
def join_multiway_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            fround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


# ---------------------------------------------------------------------------
# J5 — anti-join against a stopword set (reference: w not in
# stopwords.words('english'), Learning Dask Bags.ipynb:155 — evaluated
# per-row there; here the set is a broadcast side of a left_anti join, the
# hoist the reference forgot, SURVEY §4.1 caching row).
# ---------------------------------------------------------------------------

STOPWORDS = ("a", "the", "and", "of", "to", "in", "is", "it", "for", "on")
_STOPWORDS_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "anti_join_stopwords",
    oracle=f"""
    SELECT word, cnt FROM ({_WORDCOUNT_ORACLE})
    WHERE word NOT IN ({_STOPWORDS_SQL})
    """,
)
def anti_join_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = wordcount(spark, sf_dir)
    stop = spark.createDataFrame([(w,) for w in STOPWORDS], "word string")
    return counts.join(F.broadcast(stop), "word", "left_anti")


# ---------------------------------------------------------------------------
# Semi join (§2.4 "NOT exercised" — engine surface): customers that placed
# at least one order. left_semi avoids materializing the join payload.
# ---------------------------------------------------------------------------

@query(
    "semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
            .select("c_custkey", "c_name"))


# ---------------------------------------------------------------------------
# EXCEPT (set difference, distinct semantics both engines).
# ---------------------------------------------------------------------------

@query(
    "except_inactive_customers",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def except_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    active = (load(spark, sf_dir, "orders")
              .select(F.col("o_custkey").alias("c_custkey")))
    # subtract() IS SQL EXCEPT. The previous exceptAll+distinct spelling
    # matched only because c_custkey is unique: under left-side
    # duplicates exceptAll removes one occurrence per right row, so a
    # value present on BOTH sides could survive (review r4).
    return cust.subtract(active)


# ---------------------------------------------------------------------------
# F16 — conditional CASE buckets (reference: higher/lower compare,
# celery_app/tasks.py:80-83; determine_buy bool :96-98).
# ---------------------------------------------------------------------------

@query(
    "case_when_bucket",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 300000 THEN 'big'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           count(*) AS cnt,
           floor((avg(o_totalprice)) * 100 + 0.5) / 100 AS avg_price
    FROM orders GROUP BY 1
    """,
)
def case_when_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    bucket = (F.when(F.col("o_totalprice") >= 300000, "big")
              .when(F.col("o_totalprice") >= 100000, "mid")
              .otherwise("small"))
    return (orders.groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt"),
                 fround(F.avg("o_totalprice"), 2).alias("avg_price")))


# ---------------------------------------------------------------------------
# Distinct / count-distinct (§2.5 "NOT exercised" — engine surface).
# ---------------------------------------------------------------------------

@query(
    "distinct_count",
    oracle="""
    SELECT count(DISTINCT l_partkey) AS distinct_parts,
           count(DISTINCT l_suppkey) AS distinct_supps,
           count(*) AS cnt
    FROM lineitem
    """,
)
def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.count(F.lit(1)).alias("cnt"),
    )


# approx_count_distinct: the 100 TB-scale path (HLL sketch, no exact
# distinct shuffle). No DuckDB oracle — sketch estimates differ by design;
# the driver records a rows-only check and tests assert relative error.
@query("approx_distinct_count")
def approx_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count(F.lit(1)).alias("cnt"),
    )


# ---------------------------------------------------------------------------
# ROLLUP / CUBE (§2.5 "NOT exercised" — engine surface).
# ---------------------------------------------------------------------------

@query(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty, count(*) AS cnt
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: (flag, status), (flag), and grand total.

    Known Spark-vs-standard divergence (fuzz v8, pinned in
    tests/test_adversarial.py::test_known_grouping_sets_empty_input_divergence):
    over an EMPTY input — e.g. an upstream filter that matches nothing —
    Spark's rollup() emits ZERO rows, while the SQL standard (and
    DuckDB) emit the grand-total row with cnt=0 and NULL keys. Callers
    that rely on the grand-total row always existing must guard the
    empty-input case themselves."""
    li = load(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(fround(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.count(F.lit(1)).alias("cnt")))


@query(
    "cube_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS cnt
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^k marginals of (flag, status) in one Expand pass.

    Same empty-input caveat as rollup_agg: Spark's cube() emits zero
    rows over empty input where the standard emits the cnt=0
    grand-total row (pinned in tests/test_adversarial.py)."""
    li = load(spark, sf_dir, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("cnt")))


# ---------------------------------------------------------------------------
# Engine entry point #2: spark.sql over registered views (SURVEY §3.3 —
# the reference's ad-hoc SQL surface, airflow/dags/twitter_airflow.py:
# 132-135, generalized to multi-table ANSI SQL). The SQL string compiles
# to the same Catalyst plan a DataFrame chain would; region/nation are
# broadcast dims, so the only shuffle is the final group-by.
# ---------------------------------------------------------------------------

_SQL_REGION_REVENUE = f"""
    SELECT r_name AS region, n_name AS nation,
           count(*) AS orders_cnt,
           {fround_portable_sql('sum(o_totalprice)', 2)} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F'
    GROUP BY r_name, n_name
"""


@query("sql_region_revenue", oracle=_SQL_REGION_REVENUE)
def sql_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SQL_REGION_REVENUE)


# ---------------------------------------------------------------------------
# INTERSECT (set intersection, distinct semantics): nation keys present in
# both customer and supplier — completes the set-op family (union J3 /
# except / intersect). Plans as a left-semi aggregate, no full join payload.
# ---------------------------------------------------------------------------

@query(
    "intersect_nation_keys",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def intersect_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


# ---------------------------------------------------------------------------
# GROUPING SETS (§2.5 "NOT exercised" — engine surface): the general form
# of cube/rollup. One pass computes the (returnflag) and (linestatus)
# marginals without a self-union — Spark expands the sets map-side, so the
# input is scanned once, not once per set.
# ---------------------------------------------------------------------------

# fround_portable_sql, not bare floor(): this text runs VERBATIM on
# both engines, and Spark's bigint floor would turn a NaN revenue into
# 0 where DuckDB keeps NaN (numeric-extremes axis, r5).
_SQL_GROUPING_SETS = f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS cnt,
           {fround_portable_sql('sum(l_extendedprice)', 2)} AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


@query("grouping_sets_agg", oracle=_SQL_GROUPING_SETS)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SQL_GROUPING_SETS)
