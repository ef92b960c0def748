"""Reshape + correlated-FROM surface: UNPIVOT (melt, wide→long) and
LATERAL joins — the two relational forms the rest of the registry
doesn't exercise.

Both are Spark-4 first-class citizens (`DataFrame.melt`, SQL `LATERAL`)
and both matter at scale for the same reason: the naive re-expressions
(a UNION ALL per melted column; a per-outer-row subquery loop) multiply
scans or serialize, while the built-ins stay one-pass / one-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..datasets import load, register_views
from ..queries import query


@query(
    "unpivot_part_attrs",
    oracle="""
    SELECT p_partkey, attr, val
    FROM (
        SELECT p_partkey,
               CAST(p_size AS DOUBLE) AS size,
               CAST(p_retailprice AS DOUBLE) AS retailprice
        FROM part)
    UNPIVOT (val FOR attr IN (size, retailprice))
    ORDER BY p_partkey, attr
    """,
)
def unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt of part attributes — the reshape every
    metrics-per-entity export needs (one row per (entity, metric)).
    `melt` emits all value columns from ONE row pass (an Expand node:
    each input row fans out to k output rows in the same task) — never
    the k-scan UNION ALL a hand-rolled melt pays. Value columns are
    pre-cast to one type because UNPIVOT requires a common value type
    in both engines.

    NULL attributes are dropped explicitly: the declared contract is SQL
    UNPIVOT, which EXCLUDES NULL cells by default, while Spark's `melt`
    (pandas semantics) keeps them — on a part row with a NULL size the
    two engines silently disagree by one row (broken-RI axis, r5)."""
    part = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"))
    return (part.melt(ids=["p_partkey"],
                      values=["size", "retailprice"],
                      variableColumnName="attr",
                      valueColumnName="val")
            .filter(F.col("val").isNotNull())
            .orderBy("p_partkey", "attr"))


_LATERAL_SQL = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n, LATERAL (
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE c.c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 2
) t
ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey
"""


@query("lateral_topk_per_nation", oracle=_LATERAL_SQL)
def lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 customers per nation written as a correlated LATERAL
    subquery — the SQL-native per-group top-k (engine entry point #2:
    the same text runs on Spark and the DuckDB oracle verbatim).
    Catalyst decorrelates the LATERAL + LIMIT into a partitioned
    window/rank over customer — one shuffle on nationkey, NOT a
    per-nation re-scan loop — so the declarative form costs the same
    as the hand-written `topk_orders_per_segment` window."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)
