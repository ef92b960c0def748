"""Explicit StructType registry for every engine dataset.

SURVEY §1.3: the reference infers schemas everywhere (pandas dtype
inference, JSON shape probing, the two hardcoded taxi column lists picked by
set-difference at luigi/taxi_data_import.py:105-144). The engine decision is
the opposite: every registered dataset has an explicit, typed schema here;
`inferSchema` is allowed only in exploratory helpers.

The driver testdata tables (TESTDATA.md) are the canonical instances; the
FIXTURES.md shapes (tweets, github_events, weather, ...) are declared for
the sources/ readers.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Driver testdata (/root/testdata/sf*/<name>.parquet) — TPC-H-ish star
# schema + events stream table + LLM-pipeline tables.
# NOTE: events.ts is physically TIMESTAMP(NANOS) in the parquet; with the
# nanosAsLong conf the raw read yields LongType, and datasets.load converts
# it to the logical TimestampType declared here.
# --------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType([
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]),
    "nation": T.StructType([
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]),
    "customer": T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]),
    "supplier": T.StructType([
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]),
    "part": T.StructType([
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]),
    "orders": T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]),
    "lineitem": T.StructType([
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]),
    "events": T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON text: {"k": <int>}
    ]),
    "documents": T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]),
    "embeddings": T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]),
}

TABLE_NAMES = tuple(TESTDATA_SCHEMAS)

# --------------------------------------------------------------------------
# FIXTURES.md shapes used by sources/ readers and tests.
# --------------------------------------------------------------------------

# F-1 stocks_ohlc — flagship agg input (reference: celery_app/tasks.py:22-23).
STOCKS_OHLC = T.StructType([
    T.StructField("stock", T.StringType()),
    T.StructField("date", T.DateType()),
    T.StructField("open", T.DoubleType()),
    T.StructField("high", T.DoubleType()),
    T.StructField("low", T.DoubleType()),
    T.StructField("close", T.DoubleType()),
    T.StructField("adj_close", T.DoubleType()),
    T.StructField("volume", T.LongType()),
])

# F-2 quotes_today — header-less CSV needs explicit schema
# (reference: celery_app/tasks.py:71-73 `names=['Stock','Price','Last Trade']`).
QUOTES_TODAY = T.StructType([
    T.StructField("stock", T.StringType()),
    T.StructField("price", T.DoubleType()),
    T.StructField("last_trade", T.StringType()),
])

# F-3 tweets — flattened 21-col tweet records
# (reference: airflow/dags/twitter_airflow.py:34-66). Array columns arrive
# stringified (legacy repr()); the from_json adapter in functions/scalar.py
# restores ArrayType (SURVEY F18 — design fix: never store repr()).
TWEETS = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("tweet_id", T.LongType()),
    T.StructField("reply_status_id", T.LongType()),
    T.StructField("user_name", T.StringType()),
    T.StructField("user_screenname", T.StringType()),
    T.StructField("user_url", T.StringType()),
    T.StructField("user_description", T.StringType()),
    T.StructField("user_followers", T.LongType()),
    T.StructField("user_friends", T.LongType()),
    T.StructField("created", T.StringType()),  # ISO-8601 text
    T.StructField("text", T.StringType()),
    T.StructField("hashtags", T.StringType()),  # stringified array<string>
    T.StructField("mentions", T.StringType()),  # stringified array<struct>
    T.StructField("urls", T.StringType()),      # stringified array<string>
    T.StructField("is_quote_status", T.BooleanType()),
    T.StructField("favorite_count", T.LongType()),
    T.StructField("retweet_count", T.LongType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("query", T.StringType()),
    T.StructField("location", T.StringType()),
])

MENTION = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("screen_name", T.StringType()),
])

# F-6 github_events — nested JSON-lines
# (reference shape: Chapter 4 - Learning Dask Bags.ipynb:35).
GITHUB_EVENTS = T.StructType([
    T.StructField("type", T.StringType()),
    T.StructField("created_at", T.StringType()),
    T.StructField("payload", T.StructType([
        T.StructField("commits", T.ArrayType(T.StructType([
            T.StructField("message", T.StringType()),
        ]))),
    ])),
])

# F-7 chatlogs — JSON array-of-objects document
# (reference: data/example_chatlogs.json, luigi/wordcount_map_reduce.py:16).
CHATLOGS = T.StructType([
    T.StructField("timestamp", T.StringType()),
    T.StructField("message", T.StringType()),
    T.StructField("datatype", T.StringType()),
    T.StructField("nick", T.StringType()),
])

# F-8 weather — per-city current + forecast (J1 join inputs)
# (reference: Chapter 4 - Dask Distributed.ipynb:86).
WEATHER_CURRENT = T.StructType([
    T.StructField("search_city", T.StringType()),
    T.StructField("api_city", T.StringType()),
    T.StructField("current_temp", T.DoubleType()),
    T.StructField("current_humidity", T.DoubleType()),
    T.StructField("cod", T.IntegerType()),
])
WEATHER_FORECAST = T.StructType([
    T.StructField("search_city", T.StringType()),
    T.StructField("forecast_temps", T.ArrayType(T.DoubleType())),
    T.StructField("forecast_humidity", T.ArrayType(T.DoubleType())),
])

# Multimodal envelope: opaque payload + typed metadata (binary columns are
# first-class for a training-data pipeline; decode runs in mapInPandas).
MEDIA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),    # opaque encoded bytes
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])
