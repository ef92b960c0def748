"""Scan-order / file-layout invariance: at 100 TB every table is
thousands of files and Spark's split enumeration, scheduling, and
range-partitioner sampling all depend on physical layout — none of
which a query's ANSWER may depend on. This axis rewrites each sf0.01
table as THREE parquet files holding a fixed pseudo-random permutation
of the rows, then asserts a representative slice of the registry
returns row-for-row identical results from the scrambled layout and
the pristine single-file one.

The slice is chosen for order-sensitivity risk: window first/last and
rank (tie-break discipline), sessionize/SCD2 (lag over total orders),
the spark_partition_id-based exact-quantile rank algorithm (its range
partitioner SAMPLES the input — boundaries move with layout, ranks must
not), the collect_list/sort_array digest paths, and the LSH families.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from data_pipelines_course_spark.queries import all_queries
from tests.conftest import SF_DIR, TABLES

ORDER_SENSITIVE_SLICE = (
    "window_first_last_ratio",
    "rank_customers",
    "lag_lead_delta",
    "sessionize_events",
    "scd2_user_state_intervals",
    "asof_join_latest_click",
    "conversion_lag_native",
    "flagship_grouped_agg",
    "price_quantiles",
    "quantity_quantiles_by_flag",
    "dedup_exact",
    "ngram_jaccard_threshold_prefix",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "dup_span_report",
    "range_position",
)


@pytest.fixture(scope="module")
def scrambled_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("scrambled_sf")
    rng = np.random.RandomState(20260814)
    for name in TABLES:
        table = pq.read_table(f"{SF_DIR}/{name}.parquet")
        perm = rng.permutation(table.num_rows)
        shuffled = table.take(perm)
        tdir = out / f"{name}.parquet"
        tdir.mkdir()
        cuts = [0, table.num_rows // 3, 2 * table.num_rows // 3,
                table.num_rows]
        for i in range(3):
            part = shuffled.slice(cuts[i], cuts[i + 1] - cuts[i])
            pq.write_table(part, tdir / f"part-{i}.parquet")
    return str(out)


@pytest.mark.parametrize("name", ORDER_SENSITIVE_SLICE)
def test_layout_invariance(spark, scrambled_dir, name):
    fn = all_queries()[name]
    pristine = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    scrambled = sorted(tuple(r) for r in fn(spark, scrambled_dir).collect())
    assert scrambled == pristine, f"{name}: answer depends on layout"
