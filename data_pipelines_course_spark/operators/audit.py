"""Data-quality auditing: snapshot diffing and table profiling.

Warehouse-operations surfaces every production pipeline grows:

- ``snapshot_diff`` — classify rows as added / removed / changed between
  two snapshots of a keyed table (the data-diff that gates a backfill
  deploy: "this rewrite changed 0.3% of rows, all in column X"). The
  reference's closest shape is luigi's re-read-what-you-wrote target
  verification (`luigi/top_daily_locations.py`); diffing generalizes it
  from "did the write land" to "what exactly changed".
- ``table_profile`` — per-column null and distinct counts in one pass
  (the reference profiles interactively with pandas `.describe()` in its
  EDA notebooks; this is the distributed equivalent).
- ``value_outliers_by_type`` — per-group 3-sigma z-score flagging, the
  data-quality gate before value aggregates are trusted.

Scale notes: the diff is ONE full-outer sort-merge join on the snapshot
key — both sides shuffle once on the key, no other corpus-sized stage;
at 100 TB this is the minimal possible plan for an unordered diff (any
content-addressed scheme still reads both sides fully). The profile's
exact count(distinct) per column expands rows ×(#profiled columns)
before the aggregate (Spark's Expand); the documented at-scale swap is
approx_count_distinct, which drops the expansion to a constant-memory
sketch per column — exact kept here as the oracle ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..datasets import load, widen_scan
from ..queries import query


def key_uniqueness_report(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Duplicated-key audit: one row per key value that violates the
    uniqueness contract, with its row count and the number of DISTINCT
    payloads behind it (1 = exact re-delivery, the benign at-least-once
    case; >1 = conflicting payloads under one key — the dangerous one).

    Why it exists (PK-violation sweep, r5): the per-document digest
    operators (shingle/Jaccard dedup, decontamination, span reports,
    kNN over vec_id) compute their digest PER ROW, so a duplicated
    doc_id/vec_id carrying two different texts makes "the document"
    ambiguous and their results diverge from any entity-keyed oracle.
    That uniqueness is a declared PRECONDITION of the corpus/similarity
    family — violations must be caught by THIS audit (or healed by
    dedup_exact/keep-first) upstream, never silently entity-merged
    inside every operator. The relational/event family needs no such
    precondition: the full TPC-H surface, SCD2, sessionization and
    as-of joins are hash-exact on a PK-violating corpus
    (tests/test_adversarial.py axis 9).

    One hash-aggregate on the key: count + distinct full-row hash,
    map-side partial, no second scan. The 8-byte digest (not the full
    row) is what shuffles for the distinct — at 100 TB the wide payload
    columns never leave the map side.

    Digest encoding: xxhash64 over a NULL-disambiguated per-column
    encoding, NOT over the raw columns — Spark's hash expressions SKIP
    null inputs (a NULL argument leaves the running hash unchanged), so
    raw-column hashing would alias (k,'a',NULL) with (k,NULL,'a') and
    misreport a conflicting-payload violation as benign re-delivery
    (ADVICE r5). Every column contributes exactly one non-null argument:
    its string cast, or a NUL-prefixed marker for NULL (no corpus string
    starts with \\x00; Spark's double/timestamp→string casts are
    injective, so distinct payloads keep distinct encodings)."""
    payload = F.xxhash64(*[
        F.coalesce(F.col(c).cast("string"), F.lit("\x00<NULL>"))
        for c in df.columns])
    return (df.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                 F.countDistinct(payload).cast("bigint")
                 .alias("n_distinct_payloads"))
            .filter(F.col("n_rows") > 1))


def snapshot_diff(base: DataFrame, nxt: DataFrame, key: str,
                  compare_cols: list[str]) -> DataFrame:
    """Keyed diff of two snapshots → (key, change_type) for every row
    that is not identical: 'added' (key only in nxt), 'removed' (key
    only in base), 'changed' (key in both, any compare column differs,
    null-safe). One full-outer join on the key; comparison stays
    columnar (no row-serialization hash, which would be engine- and
    format-sensitive)."""
    # Presence is detected via marker literals, NOT key nullness: a base
    # row whose KEY is NULL never matches the equi-join, and testing
    # n.key IS NULL would misreport it as 'added' (review r4). The
    # markers distinguish "no matching row" from "row with a NULL key".
    b = base.select(key, *compare_cols).withColumn("_b", F.lit(True))
    n = nxt.select(key, *compare_cols).withColumn("_n", F.lit(True))
    joined = b.alias("b").join(n.alias("n"), on=F.col(f"b.{key}") ==
                               F.col(f"n.{key}"), how="full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"b.{c}").eqNullSafe(F.col(f"n.{c}"))
    return (joined.select(
        F.coalesce(F.col(f"b.{key}"), F.col(f"n.{key}")).alias(key),
        F.when(F.col("b._b").isNull(), F.lit("added"))
         .when(F.col("n._n").isNull(), F.lit("removed"))
         .when(changed, F.lit("changed"))
         .otherwise(F.lit("unchanged")).alias("change_type"))
        .filter(F.col("change_type") != "unchanged"))


# Deterministic simulated "next" snapshot of orders, identical on both
# engines: ~5% of keys deleted, ~14% repriced, ~7.7% re-keyed as inserts.
_DEL, _UPD, _ADD = 20, 7, 13
_ADD_OFFSET = 10_000_000


def _simulate_next(orders: DataFrame) -> DataFrame:
    kept = (orders.filter(F.col("o_orderkey") % _DEL != 0)
            .withColumn(
                "o_totalprice",
                F.when(F.col("o_orderkey") % _UPD == 3,
                       F.col("o_totalprice") * 1.1)
                .otherwise(F.col("o_totalprice"))))
    added = (orders.filter(F.col("o_orderkey") % _ADD == 5)
             .withColumn("o_orderkey",
                         F.col("o_orderkey") + _ADD_OFFSET))
    return kept.unionByName(added)


@query(
    "snapshot_diff_orders",
    oracle=f"""
    WITH nxt AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % {_UPD} = 3
                    THEN o_totalprice * 1.1 ELSE o_totalprice END
                   AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % {_DEL} <> 0
        UNION ALL
        SELECT o_orderkey + {_ADD_OFFSET}, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % {_ADD} = 5),
    b AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders)
    SELECT coalesce(b.o_orderkey, nxt.o_orderkey) AS o_orderkey,
           CASE WHEN b.o_orderkey IS NULL THEN 'added'
                WHEN nxt.o_orderkey IS NULL THEN 'removed'
                WHEN b.o_totalprice IS DISTINCT FROM nxt.o_totalprice
                     OR b.o_orderstatus IS DISTINCT FROM nxt.o_orderstatus
                    THEN 'changed'
                ELSE 'unchanged' END AS change_type
    FROM b FULL OUTER JOIN nxt ON b.o_orderkey = nxt.o_orderkey
    WHERE CASE WHEN b.o_orderkey IS NULL THEN 'added'
               WHEN nxt.o_orderkey IS NULL THEN 'removed'
               WHEN b.o_totalprice IS DISTINCT FROM nxt.o_totalprice
                    OR b.o_orderstatus IS DISTINCT FROM nxt.o_orderstatus
                   THEN 'changed'
               ELSE 'unchanged' END <> 'unchanged'
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff the orders table against a deterministic simulated rewrite
    (5% deletes, 14% reprices, 7.7% inserts): every non-identical key
    classified added/removed/changed. The float reprice (*1.1) is IEEE-
    identical on both engines, so 'changed' is exact, not tolerance-
    based."""
    orders = load(spark, sf_dir, "orders")
    return snapshot_diff(orders, _simulate_next(orders), "o_orderkey",
                         ["o_totalprice", "o_orderstatus"])


@query(
    "table_profile_orders",
    oracle="""
    SELECT 'o_custkey' AS column_name,
           CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
               AS n_nulls,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(count(*) FILTER (WHERE o_orderstatus IS NULL) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(count(*) FILTER (WHERE o_orderpriority IS NULL) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate',
           CAST(count(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT),
           CAST(count(DISTINCT o_orderdate) AS BIGINT)
    FROM orders
    """,
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile (null count + exact distinct count per
    column) over orders, unpivoted to a (column_name, n_nulls,
    n_distinct) report. Spark plans the multi-distinct aggregate as one
    scan with an Expand (×4 rows pre-aggregate); the oracle's 4-scan
    UNION is the spec. At 100 TB swap count(distinct) for
    approx_count_distinct and the Expand disappears into per-column HLL
    sketches — same report schema, documented error bound."""
    orders = load(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]
    agg = orders.agg(*(
        [F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint")
         .alias(f"{c}__nulls") for c in cols]
        + [F.countDistinct(c).cast("bigint").alias(f"{c}__distinct")
           for c in cols]))
    stack = ", ".join(f"'{c}', {c}__nulls, {c}__distinct" for c in cols)
    return agg.select(F.expr(
        f"stack({len(cols)}, {stack}) "
        "AS (column_name, n_nulls, n_distinct)"))


@query(
    "value_outliers_by_type",
    # mu/sigma are computed over the FINITE values of each type (the
    # isfinite guard is a no-op on clean data): one hostile Inf/NaN
    # value otherwise crashes DuckDB's stddev (OutOfRangeException) and
    # NaN-poisons Spark's sigma for the WHOLE type. With finite stats,
    # a +-Inf value scores +-Inf and IS reported as the outlier it is;
    # a NaN value has no orderable z-score and is excluded by the
    # NOT-isnan clause on both engines (both rank NaN > 3.0 as true,
    # which would otherwise flag it with an uncomparable score).
    # Numeric-extremes axis, r5.
    oracle="""
    WITH stats AS (
        SELECT event_type,
               avg(CASE WHEN isfinite(value) THEN value END) AS mu,
               stddev_samp(CASE WHEN isfinite(value) THEN value END)
                   AS sigma
        FROM events GROUP BY event_type)
    SELECT event_id, e.event_type,
           floor(((e.value - mu) / sigma) * 10000 + 0.5) / 10000 AS zscore
    FROM events e JOIN stats USING (event_type)
    WHERE abs(floor(((e.value - mu) / sigma) * 10000 + 0.5) / 10000) > 3.0
      AND NOT isnan(floor(((e.value - mu) / sigma) * 10000 + 0.5) / 10000)
    """,
)
def value_outliers_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical outlier flagging: events whose value is >3 sigma from
    their event_type's mean (the data-quality gate before any value
    aggregate is trusted). Two-pass by necessity — the mean/stddev must
    close over the group before any row can be scored — but the stats
    table is GROUP-CARDINALITY sized (5 rows here; bounded by distinct
    event types at any scale), so the re-join is a broadcast and the
    corpus is scanned twice with zero corpus-sized shuffles. Threshold
    membership is decided on the ROUNDED z-score on both sides: mu/sigma
    come from partial aggregation whose merge order is partition-
    dependent, so an unrounded boundary comparison could flip for a
    value within an ulp of 3.0 between engines or even between runs
    (review r4) — the same rounded-boundary rule every other float
    decision in the registry follows."""
    ev = load(spark, sf_dir, "events")
    fin = F.when(~F.isnan("value")
                 & (F.abs("value") < F.lit(float("inf"))), F.col("value"))
    stats = (ev.groupBy("event_type")
             .agg(F.avg(fin).alias("mu"),
                  F.stddev_samp(fin).alias("sigma")))
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    from ..functions.scalar import fround
    return (ev.join(stats, "event_type")
            .withColumn("zscore", fround(z, 4))
            .filter((F.abs(F.col("zscore")) > 3.0)
                    & ~F.isnan(F.col("zscore")))
            .select("event_id", "event_type", "zscore"))


_LINEITEM_COLS = (
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate")


@query(
    "key_uniqueness_report",
    # Exact distinct-row count per violating key: DuckDB's row-value
    # DISTINCT is null-safe in grouping, so it is the ground truth the
    # Spark side's 64-bit digest approximates (collision probability
    # ~n²/2⁶⁵ — vanishing at any verifiable scale, and the digest is
    # what shuffles at 100 TB, not the payload).
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT ({", ".join(_LINEITEM_COLS)})) AS BIGINT)
               AS n_distinct_payloads
    FROM lineitem
    GROUP BY l_orderkey, l_linenumber
    HAVING count(*) > 1
    """,
)
def lineitem_key_uniqueness_report(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """PK-violation audit of lineitem's composite (l_orderkey,
    l_linenumber) key — the declared PRECONDITION gate for the digest
    family (dedup/decontamination/kNN compute per-row digests, so a
    duplicated key carrying two payloads makes results entity-ambiguous;
    see operators/dedup.py module docstring). Registered because the
    driver's own generator violates this TPC-H PK (11,785 duplicate
    pairs at sf0.01, every one a conflicting-payload conflict — exactly
    the fault class this audit exists to surface before the corpus
    operators run). One hash-aggregate; the 8-byte NULL-disambiguated
    digest is the only thing shuffled besides the key.

    r12: widen the single-row-group scan (guide §2.5) — the digest is
    16 string casts (double/date→string included) + xxhash64 per row,
    the heavy-per-row-map profile of the adopted widen rule, and it ran
    serially in the one scan task. Measured 2.064 s -> 0.760 s warm at
    sf0.1 (min-of-7, interleaved, every rep below); 118,144 rows
    collect-identical; hash_match at 3 SFs. No-op at 100 TB
    (inputFiles probe). The widen sits at the registered call site, not
    inside the generic helper, which stays pure for arbitrary frames."""
    return key_uniqueness_report(
        widen_scan(load(spark, sf_dir, "lineitem"), "l_orderkey"),
        ["l_orderkey", "l_linenumber"])
