"""Text-analysis operators for a training-data pipeline (engine surface
beyond the reference, per the build brief): token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All pure JVM-side expressions (split / regexp / higher-order filter) — no
Python in the row path, so each of these runs inside whole-stage codegen
and scales linearly with input splits at 100 TB.

Reference lineage: the tokenizers generalize A6/F1-F2 (flatMap(split),
re.findall('\\w+') — Chapter 6 - Introduction to PySpark.ipynb:251, :348);
the stopword logic generalizes J5 (Learning Dask Bags.ipynb:155).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..datasets import load, widen_scan
from ..functions.scalar import fround
from ..queries import query

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOP_EN = ("a", "the", "and", "of", "to", "in", "is", "it")
STOP_DE = ("der", "die", "das", "und", "ist", "ein", "zu", "den")
STOP_FR = ("le", "la", "les", "et", "est", "un", "une", "des")


def _sql_list(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _spark_hits(words: tuple[str, ...]) -> str:
    arr = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
    return (f"size(filter(split(lower(text), '\\\\s+'),"
            f" x -> array_contains({arr}, x)))")


def _duck_hits(words: tuple[str, ...]) -> str:
    return (f"len(list_filter(string_split_regex(lower(text), '\\s+'),"
            f" x -> list_contains({_sql_list(words)}, x)))")


def _hits_of_tk(words: tuple[str, ...], tk: str = "tk"):
    """Stopword hit count over a pre-tokenized token-array column — the
    tokenize-once form of `_spark_hits` (r12, guide §1.2): CASE branches
    defeat codegen subexpression elimination, so inlining _spark_hits
    re-ran split(lower(text)) per branch reference; callers project the
    token array once and branch on these ints instead.

    Column-API form (ADVICE r12): the token column name is a parameter
    and the stopword literals go through F.lit, so a word containing a
    quote can never break an interpolated SQL string. Same expression
    tree as the former F.expr rendering."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(F.col(tk), lambda x: F.array_contains(arr, x)))


# ---------------------------------------------------------------------------
# Token counting: whitespace tokens + BPE-ish regex tokens.
# ---------------------------------------------------------------------------

@query(
    "token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER)
               AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS INTEGER)
               AS bpe_tokens
    FROM documents
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0))
        .alias("bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# Quality scoring: length / punctuation / stopword-ratio heuristics.
# ---------------------------------------------------------------------------

@query(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS text_len,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER)
               AS n_tokens,
           floor((CAST(length(text) AS DOUBLE)
                 / len(string_split_regex(trim(text), '\\s+'))) * 100 + 0.5) / 100
               AS avg_token_len,
           floor((CAST({_duck_hits(STOP_EN)} AS DOUBLE)
                 / len(string_split_regex(trim(text), '\\s+'))) * 10000 + 0.5) / 10000
               AS stopword_ratio,
           CASE WHEN len(string_split_regex(trim(text), '\\s+')) >= 20
                 AND {_duck_hits(STOP_EN)} > 0
                THEN 'keep' ELSE 'drop' END AS verdict
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen_scan (r12): per-row regex tokenization ran serially in the
    # one-row-group scan task (guide §2.5); no-op at 100 TB. Measured
    # 0.286 s -> 0.215 s warm at sf0.1; per-row values unchanged.
    docs = widen_scan(load(spark, sf_dir, "documents"), "doc_id")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    stop_hits = F.expr(_spark_hits(STOP_EN))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("text_len"),
        n_tokens.alias("n_tokens"),
        fround(F.length("text").cast("double") / n_tokens, 2)
        .alias("avg_token_len"),
        fround(stop_hits.cast("double") / n_tokens, 4).alias("stopword_ratio"),
        F.when((n_tokens >= 20) & (stop_hits > 0), "keep")
        .otherwise("drop").alias("verdict"),
    )


# ---------------------------------------------------------------------------
# Language-ID heuristic: stopword-hit scoring per candidate language with a
# deterministic priority tie-break (en > de > fr). A scoring function, not
# label recovery — the testdata lang column is synthetic.
# ---------------------------------------------------------------------------

@query(
    "lang_id",
    oracle=f"""
    SELECT doc_id,
           CAST({_duck_hits(STOP_EN)} AS INTEGER) AS hits_en,
           CAST({_duck_hits(STOP_DE)} AS INTEGER) AS hits_de,
           CAST({_duck_hits(STOP_FR)} AS INTEGER) AS hits_fr,
           CASE
             WHEN {_duck_hits(STOP_EN)} = 0 AND {_duck_hits(STOP_DE)} = 0
                  AND {_duck_hits(STOP_FR)} = 0 THEN 'unknown'
             WHEN {_duck_hits(STOP_EN)} >= {_duck_hits(STOP_DE)}
                  AND {_duck_hits(STOP_EN)} >= {_duck_hits(STOP_FR)} THEN 'en'
             WHEN {_duck_hits(STOP_DE)} >= {_duck_hits(STOP_FR)} THEN 'de'
             ELSE 'fr'
           END AS predicted_lang
    FROM documents
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12: tokenize ONCE into an array projection and branch on the hit
    # ints (the lang_confusion_report treatment, guide §1.2 — inlined
    # _spark_hits re-evaluated split(lower(text)) per CASE branch), plus
    # the single-row-group widen (§2.5). Measured 0.222 s -> 0.120 s
    # warm at sf0.1 (min-of-7, interleaved); 5000 rows collect-identical;
    # hash_match at 3 SFs.
    docs = widen_scan(load(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select("doc_id",
                       F.split(F.lower("text"), r"\s+").alias("tk"))
    counted = toks.select(
        "doc_id",
        _hits_of_tk(STOP_EN).alias("hits_en"),
        _hits_of_tk(STOP_DE).alias("hits_de"),
        _hits_of_tk(STOP_FR).alias("hits_fr"))
    predicted = (
        F.when((F.col("hits_en") == 0) & (F.col("hits_de") == 0)
               & (F.col("hits_fr") == 0), "unknown")
        .when((F.col("hits_en") >= F.col("hits_de"))
              & (F.col("hits_en") >= F.col("hits_fr")), "en")
        .when(F.col("hits_de") >= F.col("hits_fr"), "de")
        .otherwise("fr"))
    return counted.select("doc_id", "hits_en", "hits_de", "hits_fr",
                          predicted.alias("predicted_lang"))


# ---------------------------------------------------------------------------
# Document fingerprinting: content hash (md5) — the exact-dedup key.
# ---------------------------------------------------------------------------

@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id, md5(text) AS fp, CAST(length(text) AS BIGINT) AS text_len
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.length("text").cast("long").alias("text_len"),
    )


# ---------------------------------------------------------------------------
# Per-source corpus stats (grouped profile of the documents table).
# ---------------------------------------------------------------------------

@query(
    "doc_length_stats",
    oracle="""
    SELECT lang, count(*) AS cnt,
           floor((avg(CAST(n_chars AS DOUBLE))) * 100 + 0.5) / 100 AS avg_chars,
           max(n_chars) AS max_chars, min(n_chars) AS min_chars
    FROM documents GROUP BY lang
    """,
)
def doc_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (docs.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 fround(F.avg(F.col("n_chars").cast("double")), 2)
                 .alias("avg_chars"),
                 F.max("n_chars").alias("max_chars"),
                 F.min("n_chars").alias("min_chars")))


@query(
    "lang_confusion_report",
    oracle=f"""
    WITH pred AS (
        SELECT doc_id,
               CASE
                 WHEN {_duck_hits(STOP_EN)} = 0 AND {_duck_hits(STOP_DE)} = 0
                      AND {_duck_hits(STOP_FR)} = 0 THEN 'unknown'
                 WHEN {_duck_hits(STOP_EN)} >= {_duck_hits(STOP_DE)}
                      AND {_duck_hits(STOP_EN)} >= {_duck_hits(STOP_FR)}
                      THEN 'en'
                 WHEN {_duck_hits(STOP_DE)} >= {_duck_hits(STOP_FR)}
                      THEN 'de'
                 ELSE 'fr'
               END AS predicted_lang
        FROM documents),
    cells AS (
        SELECT d.lang, p.predicted_lang,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM pred p JOIN documents d USING (doc_id)
        GROUP BY d.lang, p.predicted_lang)
    SELECT lang, predicted_lang, n_docs,
           floor((CAST(n_docs AS DOUBLE)
                  / sum(n_docs) OVER (PARTITION BY lang)) * 10000 + 0.5)
               / 10000 AS share
    FROM cells
    """,
)
def lang_confusion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-vs-label CONFUSION MATRIX for the language-ID
    heuristic: per (labeled lang, predicted lang) cell, document count
    and the cell's share of its label row — the audit every filtering
    classifier needs before it gates a corpus (a label whose row mass
    lands on 'unknown' means the classifier, not the data, is dropping
    that language; DataComp-style filter audits lead with this table).

    Plan: the prediction is pure per-row codegen (stopword-hit CASE,
    same expressions as lang_id); the labels ride the SAME scan, so the
    only exchange is the (langs x predictions)-key aggregate; the share
    window runs over that K-row result, never the corpus.

    r12 optimization (guide §1.2 per-task work + §2.5): the CASE
    branches originally inlined `_spark_hits` per reference — up to 7
    evaluations of split(lower(text)) per row, because conditional
    branches defeat codegen subexpression elimination. Tokenize ONCE
    into an array projection, compute the three hit counts off it, and
    branch on those ints; then widen the single-row-group scan so the
    tokenize runs 32-way (the same per-row-regex-cost rule that
    adopted text_quality's widen). Confusion cells are exact ints, so
    placement cannot change any value; rows verified identical and
    hash_match at 3 SFs. Measured 0.576 s -> 0.290 s warm at sf0.1
    (min-of-7, interleaved: 0.58 -> 0.37 single-tokenize, -> 0.29
    widened)."""
    docs = widen_scan(load(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select("lang", F.split(F.lower("text"), r"\s+").alias("tk"))

    def hits_of(words: tuple[str, ...]):
        lst = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
        return F.expr(f"size(filter(tk, x -> array_contains({lst}, x)))")

    counted = toks.select(
        "lang",
        hits_of(STOP_EN).alias("h_en"),
        hits_of(STOP_DE).alias("h_de"),
        hits_of(STOP_FR).alias("h_fr"))
    predicted = (
        F.when((F.col("h_en") == 0) & (F.col("h_de") == 0)
               & (F.col("h_fr") == 0), "unknown")
        .when((F.col("h_en") >= F.col("h_de"))
              & (F.col("h_en") >= F.col("h_fr")), "en")
        .when(F.col("h_de") >= F.col("h_fr"), "de")
        .otherwise("fr"))
    from pyspark.sql import Window

    cells = (counted.select("lang", predicted.alias("predicted_lang"))
             .groupBy("lang", "predicted_lang")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs")))
    lang_w = Window.partitionBy("lang")
    return cells.select(
        "lang", "predicted_lang", "n_docs",
        fround(F.col("n_docs").cast("double")
               / F.sum("n_docs").over(lang_w), 4).alias("share"))
