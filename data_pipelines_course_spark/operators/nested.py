"""Nested-data operators: JSON parsing and array higher-order functions —
SURVEY §2.8 F17-F21 and A8 (mean over an array field).

The reference handles nested data in Python space (json.loads per row,
list comprehensions over structs, itertools.chain flattening). Here every
step stays JVM-side: from_json / get_json_object, explode, and the
higher-order functions transform/aggregate/size — all inside whole-stage
codegen, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..datasets import load
from ..functions.scalar import fround
from ..queries import query

# ---------------------------------------------------------------------------
# F17 — JSON parse (reference: json.loads(data), streaming/tweepy_stream.py:62
# and Learning Dask Bags.ipynb:35). events.props is a JSON text column.
# ---------------------------------------------------------------------------

PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])


@query(
    "json_extract_props",
    # json_valid guard + TRY_CAST: DuckDB's json_extract_string ERRORS on
    # malformed JSON while Spark's from_json is PERMISSIVE (row -> NULL);
    # both are no-ops on well-formed props (malformed-JSON axis, r5).
    # Residual coercion divergences ('1.9', '"7"', duplicate keys) are
    # pinned in tests/test_adversarial.py::test_json_coercion_divergence.
    oracle="""
    SELECT event_id,
           CASE WHEN json_valid(props)
                THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
           END AS k
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json("props", PROPS_SCHEMA).getField("k").alias("k"),
    )


# ---------------------------------------------------------------------------
# F17 + aggregation: group on a JSON-extracted key. At scale the parse runs
# once per row inside codegen and the aggregation is an ordinary partial+
# final hash agg on the extracted int.
# ---------------------------------------------------------------------------

@query(
    "json_group_by_key",
    # Same malformed-JSON guards as json_extract_props (axis r5).
    oracle="""
    SELECT CASE WHEN json_valid(props)
                THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
           END AS k,
           count(*) AS cnt, floor((sum(value)) * 100 + 0.5) / 100 AS total
    FROM events GROUP BY 1
    """,
)
def json_group_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No widen_scan here (r13, VERDICT r12 #1): the r12 widen shuffled
    # the full `props` JSON payload to parallelize from_json — the exact
    # trade the props_map_stats/wordcount rejections argue against. The
    # driver's gated ground truth (0.289 -> 0.681 s) and the r13
    # quiet-box interleaved A/B (plain 0.366 vs widened 0.542 min-of-7,
    # nearly every plain rep below the widened min) both show the
    # payload shuffle costs more than the parallel parse gains; the r12
    # local win was an artifact of that session's noisy box. At 100 TB
    # the widen was a no-op anyway (inputFiles probe), so the serial-
    # parse concern never applied at scale.
    ev = load(spark, sf_dir, "events")
    k = F.from_json("props", PROPS_SCHEMA).getField("k").alias("k")
    return (ev.groupBy(k)
            .agg(F.count(F.lit(1)).alias("cnt"),
                 fround(F.sum("value"), 2).alias("total")))


# ---------------------------------------------------------------------------
# F21 — array length (reference: len(x['payload']['commits']),
# Learning Dask Bags.ipynb:97).
# ---------------------------------------------------------------------------

@query(
    "array_size",
    oracle="""
    SELECT vec_id, label, CAST(len(embedding) AS INTEGER) AS dim
    FROM embeddings
    """,
)
def array_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "label", F.size("embedding").alias("dim"))


# ---------------------------------------------------------------------------
# F20 — array element extraction (reference: [fr['main']['temp'] for fr in
# list], Dask Distributed.ipynb:86). Exact float32 values — no rounding.
# ---------------------------------------------------------------------------

@query(
    "array_element_extract",
    oracle="""
    SELECT vec_id, embedding[1] AS first_dim, embedding[-1] AS last_dim
    FROM embeddings
    """,
)
def array_element_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    # element_at(-1), not a hard-coded 64: "last_dim" must not raise on a
    # corpus with a different embedding width (ANSI makes a fixed
    # out-of-range index an error, not NULL; adversarial-corpus find).
    return emb.select(
        "vec_id",
        F.element_at("embedding", 1).alias("first_dim"),
        F.element_at("embedding", -1).alias("last_dim"),
    )


# ---------------------------------------------------------------------------
# A8 — mean over an array field, rounded 2dp (reference:
# np.round(np.mean(forecast_temps), 2), Dask Distributed.ipynb:122).
# Higher-order aggregate keeps the summation sequential per-row (identical
# on both engines once elements are upcast to double before summing).
# ---------------------------------------------------------------------------

@query(
    "array_mean",
    oracle="""
    SELECT vec_id,
           floor((list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
                 / len(embedding)) * 100 + 0.5) / 100 + 0.0 AS emb_mean
    FROM embeddings
    """,
)
def array_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    # fround, not inline floor(): Spark's floor returns BIGINT, which
    # maps a NaN mean to 0 and clamps |x| >= 2^63 to Long.MAX while the
    # oracle's double-space floor passes both through (extremes axis r5).
    raw = F.expr(
        "aggregate(embedding, cast(0.0 as double),"
        " (acc, x) -> acc + cast(x as double)) / size(embedding)")
    return emb.select(
        "vec_id", (fround(raw, 2) + F.lit(0.0)).alias("emb_mean"))


# ---------------------------------------------------------------------------
# F20 transform + aggregate — squared-L2 norm via HOFs (the reference's
# list-comprehension-over-array shape, computed JVM-side).
# ---------------------------------------------------------------------------

@query(
    "array_transform_norm",
    oracle="""
    SELECT vec_id,
           floor((list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 100 + 0.5) / 100 AS sq_norm
    FROM embeddings
    """,
)
def array_transform_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    # fround for the same BIGINT-floor reason as array_mean above.
    raw = F.expr(
        "aggregate(transform(embedding,"
        " x -> cast(x as double) * cast(x as double)),"
        " cast(0.0 as double), (acc, x) -> acc + x)")
    return emb.select("vec_id", fround(raw, 2).alias("sq_norm"))


# ---------------------------------------------------------------------------
# F19 — explode / flatten (reference: itertools.chain.from_iterable,
# airflow/dags/twitter_airflow.py:137): per-label mean of all embedding
# components. Rounded 4dp — cross-row summation order differs by engine.
# ---------------------------------------------------------------------------

@query(
    "explode_array_agg",
    oracle="""
    SELECT label, floor((avg(CAST(u AS DOUBLE))) * 10000 + 0.5) / 10000 + 0.0 AS comp_mean,
           count(*) AS comp_cnt
    FROM (SELECT label, unnest(embedding) AS u FROM embeddings)
    GROUP BY label
    """,
)
def explode_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return (emb.select("label", F.explode("embedding").alias("u"))
            .groupBy("label")
            .agg((fround(F.avg(F.col("u").cast("double")), 4) + F.lit(0.0)).alias("comp_mean"),
                 F.count(F.lit(1)).alias("comp_cnt")))


# ---------------------------------------------------------------------------
# VariantType (Spark 4): schema-on-read semi-structured access without a
# declared struct. Where from_json needs the full target schema up front
# (PROPS_SCHEMA above), parse_json keeps the value as a binary-encoded
# VARIANT and typed access happens per-path at query time — the right
# model when event payloads evolve faster than schemas (the reference's
# ad-hoc dict probing, Learning Dask Bags.ipynb:53, done engine-side).
# Variant pathing is JVM codegen, not a Python JSON loop.
# ---------------------------------------------------------------------------

@query(
    "variant_props_extract",
    # Guarded like json_extract_props (axis r5); coercion divergences
    # (variant truncates '1.9'->1, casts true->1, rejects duplicate
    # keys) pinned in test_json_coercion_divergence.
    oracle="""
    SELECT event_id,
           CASE WHEN json_valid(props)
                THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
           END AS k,
           CASE WHEN json_valid(props)
                THEN TRY_CAST(json_extract_string(props, '$.missing')
                              AS INTEGER)
           END AS absent
    FROM events
    """,
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed per-path extraction from a VARIANT column; absent paths are
    NULL under try_variant_get (no declared schema anywhere).

    try_parse_json, NOT parse_json: parse_json throws MALFORMED_RECORD on
    the first bad document, so ONE corrupt props row would kill the whole
    job — the exact failure mode a schema-free variant sweep exists to
    survive. try_parse_json maps malformed input to a NULL variant, which
    try_variant_get then reads as NULL (malformed-JSON axis, r5)."""
    ev = load(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k"),
        F.try_variant_get(v, "$.missing", "int").alias("absent"),
    )


# ---------------------------------------------------------------------------
# MAP-typed columns (beyond-reference): JSON payload → map<string,string> →
# explode — the schema-free key/value profile of an evolving event payload
# (completes the nested family next to struct/array/variant access).
# ---------------------------------------------------------------------------

@query(
    "props_map_stats",
    # json_valid guard (axis r5): json_keys errors on malformed JSON;
    # Spark's from_json(map) yields NULL there and explode drops the
    # row, so filtering invalid rows IS the engine's semantics. A
    # valid non-object ('[1,2]', scalar) has json_keys = [] on both
    # sides (unnest drops / NULL map drops).
    oracle="""
    SELECT k AS prop_key,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT json_extract_string(props, '$.' || k))
                AS BIGINT) AS n_values,
           min(json_extract_string(props, '$.' || k)) AS min_val,
           max(json_extract_string(props, '$.' || k)) AS max_val
    FROM (SELECT props, unnest(json_keys(props)) AS k FROM events
          WHERE json_valid(props))
    GROUP BY k
    ORDER BY prop_key
    """,
)
def props_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key/value profile of the props payload treated as a MAP (no
    declared schema): every key that occurs, its row count, distinct
    values, and lexicographic value range. `explode(from_json(...,
    map<string,string>))` emits one (key, value) row per entry in one
    pass — the payload-auditing sweep run before promoting a raw JSON
    feed to typed columns. One hash aggregate on the (bounded) key
    space; values compare as strings on both engines."""
    ev = load(spark, sf_dir, "events")
    kv = ev.select(F.explode(
        F.from_json("props", "map<string,string>")).alias("prop_key", "val"))
    return (kv.groupBy("prop_key")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                 F.countDistinct("val").cast("bigint").alias("n_values"),
                 F.min("val").alias("min_val"),
                 F.max("val").alias("max_val"))
            .orderBy("prop_key"))
