"""Text-preparation operators for an LLM training-data pipeline: PII /
denylist redaction, vocabulary construction, per-source TF-IDF salience,
and corpus-wide boilerplate n-gram detection.

All four stay JVM-side (regexp_replace / split / explode / window) — no
Python in the row path — so they run inside whole-stage codegen and
scale linearly with input splits. Where a global ordering is needed
(vocabulary rank, boilerplate top-k) the plan is a hash aggregate
followed by TakeOrderedAndProject, never a full sort.

Reference lineage: generalizes the course's tokenize/flatMap/top-k
wordcount family (Chapter 6 - Introduction to PySpark.ipynb:251, :348)
to the curation ops a 100 TB text pipeline actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..datasets import load
from ..functions.scalar import fround, fround_sql
from ..queries import query

# Patterns are deliberately written in the common subset of Java regex
# (Spark) and RE2 (DuckDB): character classes, \b, {m,}, alternation —
# no lookarounds, no backreferences — so ONE pattern string drives both
# engines and the oracle proves the redaction byte-identical.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"
# Denylist scrubbing (user handles / project codenames / tracked terms).
# The synthetic corpus carries no emails or phones, so the denylist is
# what exercises the replace path end-to-end here; the email/phone
# branches share the exact same plan shape.
_DENYLIST = ("customer", "spark")
_DENY_RE = r"\b(" + "|".join(_DENYLIST) + r")\b"
_MASK = "[REDACTED]"


@query(
    "pii_redaction",
    oracle=f"""
    SELECT doc_id,
           md5(redacted) AS redacted_md5,
           CAST(length(text) - length(
               regexp_replace(text, '{_DENY_RE}', '', 'g')) AS BIGINT)
               AS denylist_chars,
           CAST(CASE WHEN regexp_matches(text, '{_EMAIL_RE}')
                     OR regexp_matches(text, '{_PHONE_RE}')
                THEN 1 ELSE 0 END AS INTEGER) AS had_contact_pii
    FROM (
        SELECT doc_id, text,
               regexp_replace(regexp_replace(regexp_replace(
                   text, '{_EMAIL_RE}', '{_MASK}', 'g'),
                   '{_PHONE_RE}', '{_MASK}', 'g'),
                   '{_DENY_RE}', '{_MASK}', 'g') AS redacted
        FROM documents)
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub PII-shaped spans (emails, phone numbers) and a denylist of
    tracked terms from every document, emitting the redacted-text hash
    plus per-doc audit counters. Pure regexp_replace chain — one scan,
    zero shuffles, codegen throughout; at 100 TB this is the canonical
    map-only pass and its cost is the scan itself. The md5 lets the
    oracle prove the REDACTED BYTES equal DuckDB's, not just the
    counters."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, _MASK),
            _PHONE_RE, _MASK),
        _DENY_RE, _MASK)
    deny_chars = (F.length("text")
                  - F.length(F.regexp_replace(F.col("text"), _DENY_RE, "")))
    had_pii = (F.col("text").rlike(_EMAIL_RE)
               | F.col("text").rlike(_PHONE_RE))
    return docs.select(
        "doc_id",
        F.md5(redacted).alias("redacted_md5"),
        deny_chars.cast("bigint").alias("denylist_chars"),
        F.when(had_pii, 1).otherwise(0).cast("int").alias("had_contact_pii"))


@query(
    "vocabulary_build",
    oracle="""
    SELECT CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT)
               AS rank,
           token, n
    FROM (
        SELECT token, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
              FROM documents)
        GROUP BY token)
    ORDER BY rank
    LIMIT 100
    """,
)
def vocabulary_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a frequency-ranked token vocabulary (the id-assignment step
    before any BPE training): explode → count → rank, top-100. The count
    is a two-phase hash aggregate (map-side partials absorb the token
    Zipf skew before the exchange); the global rank applies AFTER a
    top-k, so the sort is TakeOrderedAndProject over the surviving 100
    rows, never a full-vocabulary sort. Ties break on the token string
    for a deterministic oracle hash."""
    docs = load(spark, sf_dir, "documents")
    counts = (docs.select(F.explode(
                  F.split(F.trim(F.col("text")), r"\s+")).alias("token"))
              .groupBy("token")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
              .orderBy(F.desc("n"), "token")
              .limit(100))
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("n"), "token")  # 100 rows: single-task OK
    return (counts.withColumn(
                "rank", F.row_number().over(w).cast("bigint"))
            .select("rank", "token", "n"))


@query(
    "tfidf_top_terms",
    oracle=f"""
    SELECT source, term, tf,
           {fround_sql("tf * ln(20.0 / df)", 6)} AS tfidf
    FROM (
        SELECT source, term, tf, df,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY tf * ln(20.0 / df) DESC, term) AS rn
        FROM (
            SELECT source, term, tf,
                   count(*) OVER (PARTITION BY term) AS df
            FROM (
                SELECT source, term, CAST(count(*) AS BIGINT) AS tf
                FROM (SELECT source,
                             unnest(string_split_regex(trim(text), '\\s+'))
                                 AS term
                      FROM documents)
                GROUP BY source, term)))
    WHERE rn <= 3
    ORDER BY source, tfidf DESC, term
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source TF-IDF salience: the terms that distinguish each source
    from the rest of the corpus (source-level mixture diagnostics). Three
    stages, all keyed on bounded-cardinality columns: (1) hash-agg term
    frequency per (source, term); (2) document frequency as a window
    count per term over the AGGREGATED table (vocab-sized, not
    corpus-sized — never a second scan of documents); (3) per-source
    top-3 via row_number. The idf denominator is the fixed 20-source
    layout of this corpus; at scale it is count(distinct source), a
    one-row broadcast."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    tf = (docs.select("source", F.explode(
              F.split(F.trim(F.col("text")), r"\s+")).alias("term"))
          .groupBy("source", "term")
          .agg(F.count(F.lit(1)).cast("bigint").alias("tf")))
    df_w = Window.partitionBy("term")
    score = F.col("tf") * F.log(F.lit(20.0) / F.count(F.lit(1)).over(df_w))
    rank_w = Window.partitionBy("source").orderBy(F.desc("score"), "term")
    return (tf.withColumn("score", score)
            .withColumn("rn", F.row_number().over(rank_w))
            .filter(F.col("rn") <= 3)
            .select("source", "term", "tf",
                    fround(F.col("score"), 6).alias("tfidf"))
            .orderBy("source", F.desc("tfidf"), "term"))


@query(
    "boilerplate_ngrams",
    oracle="""
    SELECT ngram, CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM (
        SELECT t1.doc_id,
               t1.w || ' ' || t2.w || ' ' || t3.w AS ngram
        FROM (SELECT doc_id, unnest(toks) AS w,
                     generate_subscripts(toks, 1) AS pos
              FROM (SELECT doc_id,
                           string_split_regex(trim(text), '\\s+') AS toks
                    FROM documents)) t1
        JOIN (SELECT doc_id, unnest(toks) AS w,
                     generate_subscripts(toks, 1) AS pos
              FROM (SELECT doc_id,
                           string_split_regex(trim(text), '\\s+') AS toks
                    FROM documents)) t2
          ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
        JOIN (SELECT doc_id, unnest(toks) AS w,
                     generate_subscripts(toks, 1) AS pos
              FROM (SELECT doc_id,
                           string_split_regex(trim(text), '\\s+') AS toks
                    FROM documents)) t3
          ON t1.doc_id = t3.doc_id AND t3.pos = t1.pos + 2)
    GROUP BY ngram
    ORDER BY n_occurrences DESC, ngram
    LIMIT 20
    """,
)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide boilerplate detection: the most frequent word
    3-grams, with how many documents carry them (headers, footers,
    license blurbs at real scale). Spark builds the n-grams WITHOUT the
    oracle's positional self-join: one `transform` over a `sequence` of
    start offsets slides the window inside the array column — a single
    scan, one explode, one hash aggregate, top-k. The oracle's 3-way
    join form is the semantic spec; the array-slide form is the 100 TB
    plan (per-row work is O(tokens), no join at all)."""
    docs = load(spark, sf_dir, "documents")
    # sequence(0, size-3) start offsets -> concat_ws of the 3-token
    # slide; documents shorter than 3 tokens contribute an empty array
    # (sequence(0, negative) would flip to a DESCENDING range — guarded).
    # The token array is STAGED through a projection: inlining split()
    # into the lambda re-splits per element (O(tokens²) per doc; see
    # repetition_ratio for the measured 16× cost of that shape).
    ngrams = F.expr(
        "CASE WHEN size(toks) >= 3 THEN"
        " transform(sequence(0, size(toks) - 3),"
        " i -> concat_ws(' ', slice(toks, i + 1, 3)))"
        " ELSE array() END")
    return (docs
            .select("doc_id",
                    F.split(F.trim(F.col("text")), r"\s+").alias("toks"))
            .select("doc_id", F.explode(ngrams).alias("ngram"))
            .groupBy("ngram")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
                 F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
            .orderBy(F.desc("n_occurrences"), "ngram")
            .limit(20))
