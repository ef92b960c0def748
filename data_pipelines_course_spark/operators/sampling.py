"""Deterministic sampling, train/eval splitting, and mixture sampling.

Training-data pipelines need reproducible sampling: the same corpus +
the same config must yield the SAME sample on every run, on any cluster,
regardless of partitioning — which rules out `df.sample()`/`rand()`
(seeded per-partition, so a repartition changes the sample). The standard
trick is content hashing: bucket = md5(key) mod N, then select buckets.
The reference's closest shape is `random.choice` branching
(airflow/dags/generate_twitter.py:48 — F23), upgraded here from
"random at orchestration time" to "deterministic function of the row".

md5 (not xxhash64) because it is the one hash both engines share, so the
sample is *oracle-checkable*: DuckDB computes the identical buckets.
The top 16 bits of the digest give 65,536 values; mod-100 bias is ≤0.06%
— irrelevant for sampling, and identical on both sides. At 100 TB the
expression is pure codegen on the scan: sampling never shuffles, and the
parquet reader prunes nothing (every row must be hashed) but projects
only the key + kept columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..datasets import load
from ..functions.scalar import fround, fround_sql
from ..queries import query

BUCKETS = 100


def hash_bucket(col: Column, buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from the md5 of the key's
    string form — stable across runs, partitionings, and engines."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10)
            .cast("int") % F.lit(buckets))


def _bucket_sql(expr: str, buckets: int = BUCKETS) -> str:
    """The DuckDB-equivalent bucket expression (oracle side)."""
    return (f"CAST(('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, 4)) "
            f"AS INTEGER) % {buckets}")


def deterministic_sample(df: DataFrame, key: str, pct: int,
                         buckets: int = BUCKETS) -> DataFrame:
    """Keep rows whose hash bucket < pct — a reproducible pct% sample."""
    return df.filter(hash_bucket(F.col(key), buckets) < pct)


def train_eval_split(df: DataFrame, key: str, eval_pct: int = 10,
                     buckets: int = BUCKETS) -> DataFrame:
    """Attach a stable split column: ~eval_pct% 'eval', rest 'train'.
    Membership is a pure function of the key, so re-runs and incremental
    appends never migrate a document between splits (the property that
    matters for decontamination-safe training)."""
    return df.withColumn(
        "split",
        F.when(hash_bucket(F.col(key), buckets) < eval_pct,
               F.lit("eval")).otherwise(F.lit("train")))


def mixture_sample(df: DataFrame, key: str, strata_col: str,
                   rates: dict[str, int],
                   default_pct: int = 0,
                   buckets: int = BUCKETS) -> DataFrame:
    """Per-stratum sampling rates (a data-mix recipe): keep rows where
    bucket < rate[stratum]. The deterministic analog of `sampleBy`."""
    rate = F.lit(default_pct)
    for value, pct in rates.items():
        rate = F.when(F.col(strata_col) == value, F.lit(pct)).otherwise(rate)
    return df.filter(hash_bucket(F.col(key), buckets) < rate)


# ---------------------------------------------------------------------------
# Registered queries + oracles
# ---------------------------------------------------------------------------

@query(
    "deterministic_sample_docs",
    oracle=f"""
    SELECT doc_id, {_bucket_sql('doc_id')} AS bucket
    FROM documents
    WHERE {_bucket_sql('doc_id')} < 10
    """,
)
def deterministic_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% reproducible sample of the document corpus by doc_id hash."""
    docs = load(spark, sf_dir, "documents")
    return (deterministic_sample(docs, "doc_id", pct=10)
            .select("doc_id", hash_bucket(F.col("doc_id")).alias("bucket")))


@query(
    "train_eval_split_docs",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_bucket_sql('doc_id')} < 10
                THEN 'eval' ELSE 'train' END AS split
    FROM documents
    """,
)
def train_eval_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 90/10 train/eval assignment for every document."""
    docs = load(spark, sf_dir, "documents")
    return train_eval_split(docs, "doc_id", eval_pct=10).select("doc_id", "split")


@query(
    "stratified_sample_per_source",
    oracle="""
    SELECT doc_id, source, CAST(rn AS INTEGER) AS rn
    FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    ) WHERE rn <= 5
    """,
)
def stratified_sample_per_source(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Equal-allocation stratified sample: exactly 5 docs per source,
    chosen by md5-of-key order — deterministic across runs, partitionings
    and engines (hex md5 sorts identically everywhere), unlike a seeded
    sampleBy. The balancing op for over/under-represented provenance
    buckets in a data mix. One shuffle on source; row_number cuts each
    stratum to k rows immediately, so nothing beyond 5/stratum survives
    the window stage."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    w = (Window.partitionBy("source")
         .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
    return (docs.select("doc_id", "source",
                        F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= 5))


@query(
    "mixture_sample_events",
    oracle=f"""
    SELECT event_id, event_type
    FROM events
    WHERE {_bucket_sql('event_id')} <
          CASE event_type
              WHEN 'purchase' THEN 100
              WHEN 'click' THEN 20
              ELSE 5
          END
    """,
)
def mixture_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mix recipe over the event stream: keep all purchases, 20% of
    clicks, 5% of everything else — deterministic, per-row, no shuffle."""
    ev = load(spark, sf_dir, "events")
    return (mixture_sample(ev, "event_id", "event_type",
                           rates={"purchase": 100, "click": 20},
                           default_pct=5)
            .select("event_id", "event_type"))


@query(
    "weighted_sample_docs",
    oracle=f"""
    SELECT doc_id, n_chars,
           {fround_sql('ln((' + _bucket_sql('doc_id', 65536)
                       + ' + 0.5) / 65536.0) / n_chars', 6)} AS es_key
    FROM documents
    WHERE n_chars > 0
    ORDER BY es_key DESC, doc_id
    LIMIT 100
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis, IPL 2006): each doc gets key u^(1/w) — here the monotone-
    equivalent ln(u)/w with weight w = n_chars and u derived from the
    md5 bucket ((b+0.5)/65536, never 0) — and the sample is the top-k by
    key. Long documents are proportionally likelier, yet the draw is a
    pure function of doc_id: re-runs, repartitions and engines agree
    row-for-row (a seeded rand() would not survive any of those). One
    scan + TakeOrderedAndProject — the distributed one-pass weighted
    reservoir; no shuffle beyond the top-k merge. Zero-weight rows are
    excluded on BOTH sides: ln(u)/0 is -Infinity on Spark but NULL on
    DuckDB, a latent cross-engine divergence (no such row exists in the
    testdata; the guard keeps the semantics defined anyway)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (hash_bucket(F.col("doc_id"), 65536).cast("double") + 0.5) / 65536.0
    es_key = fround(F.log(u) / F.col("n_chars"), 6)
    return (docs.select("doc_id", "n_chars", es_key.alias("es_key"))
            .orderBy(F.desc("es_key"), "doc_id")
            .limit(100))


@query(
    "temperature_resample_docs",
    oracle=f"""
    WITH c AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY source),
    m AS (SELECT min(n) AS mn FROM c),
    r AS (
        SELECT source, n, sqrt(CAST(mn AS DOUBLE) / n) AS rate
        FROM c CROSS JOIN m)
    SELECT d.doc_id, d.source,
           {fround_sql('r.rate', 4)} AS accept_rate
    FROM documents d JOIN r USING (source)
    WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))
               AS INTEGER) < r.rate * 65536
    """,
)
def temperature_resample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture rebalancing with TEMPERATURE tau=0.5 (the standard
    multilingual/multi-source mixing move: sample source s proportional
    to n_s^tau, flattening the head without discarding the tail —
    mBERT/XLM-R exponent-smoothed sampling, also how pretraining mixes
    crawl vs curated sources). Acceptance rate per source is
    n_s^(tau-1) normalized so the RAREST source keeps everything:
    rate_s = sqrt(min_n / n_s) for tau = 0.5.

    Determinism + parity: membership is the md5-bucket of doc_id (the
    module contract — repartition/engine invariant), and the rate uses
    ONE sqrt of an exact integer ratio — sqrt is IEEE correctly-rounded
    in both engines, so the acceptance threshold is bit-identical and
    the oracle hash can't flip (pow(x, 0.5) would not guarantee that).

    Plan: the per-source count table is O(sources) — broadcast; the
    corpus is filtered map-side on the scan, never shuffled. At 100 TB
    this is a zero-shuffle pass like deterministic_sample_docs."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    # min(n) as an unpartitioned window over the O(sources)-row counts
    # relation — NOT a separate .agg() + crossJoin, which would plan a
    # third corpus scan (Catalyst does not reuse the aggregate subtree
    # across branches pre-AQE). The single-partition window holds
    # O(sources) rows, so the usual anti-pattern warning doesn't apply.
    rates = (counts
             .withColumn("mn", F.min("n").over(
                 Window.partitionBy(F.lit(1))))
             .select("source",
                     F.sqrt(F.col("mn").cast("double") / F.col("n"))
                     .alias("rate")))
    return (docs.join(F.broadcast(rates), "source")
            .filter(hash_bucket(F.col("doc_id"), 65536).cast("double")
                    < F.col("rate") * 65536)
            .select("doc_id", "source",
                    fround(F.col("rate"), 4).alias("accept_rate")))
