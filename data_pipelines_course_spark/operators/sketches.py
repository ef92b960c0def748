"""Mergeable sketch aggregates (Apache DataSketches HLL, built into
Spark) — the cardinality machinery a 100 TB pipeline actually ships.

`approx_distinct_count` (relational.py) already covers the one-shot
HyperLogLog++ estimate. What THESE operators add is mergeability: an
`hll_sketch_agg` produces a binary sketch that `hll_union_agg` can
combine later, so per-partition / per-day sketches roll up without ever
re-touching the raw data — count-distinct over any ad-hoc slice becomes
a metadata-sized merge instead of a full scan. That is the difference
between "approximate count" and "pre-aggregatable approximate count",
and at 100 TB only the second survives (daily sketch tables are the
standard design).

No SQL oracle: sketch bytes are engine-specific (rows-only driver check);
accuracy and merge-consistency are pytest-asserted against exact counts
(tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..datasets import load
from ..queries import query


@query("sketch_distinct_users_by_type")  # rows-only: sketch bytes not SQL
def sketch_distinct_users_by_type(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Distinct users per event type via HLL sketches, plus a grand
    total computed by UNIONING the per-type sketches — never re-scanning
    events. The union step consumes 5 sketch blobs (~KB), which is the
    entire point: at scale the per-type sketches would live in a rollup
    table and any cross-slice distinct count is a driver-sized merge."""
    ev = load(spark, sf_dir, "events")
    per_type = (ev.groupBy("event_type")
                .agg(F.hll_sketch_agg("user_id").alias("sk")))
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").cast("bigint").alias("approx_users"))
    total = (per_type.agg(F.hll_union_agg("sk").alias("sk"))
             .select(F.lit("ALL").alias("event_type"),
                     F.hll_sketch_estimate("sk").cast("bigint")
                     .alias("approx_users")))
    return typed.unionAll(total).orderBy("event_type")
