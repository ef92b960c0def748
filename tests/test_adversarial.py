"""Adversarial-corpus parity: the engine vs DuckDB on data the driver's
testdata never shows it — NULL text/lang/value/props, empty strings,
single-word and exactly-window-sized documents, tab/whitespace edge
tokens, exact-duplicate and near-duplicate pairs, tied event timestamps,
single-event users, and a zero embedding vector.

Round-4 finds this sweep produced (each now fixed + pinned here):
- cosine divide-by-zero on zero-norm embeddings (knn, neardup, kmeans
  normalization) — zero vectors now filtered/NULL-safe;
- hard-coded embedding index 64 raising under ANSI on other widths;
- NULL payloads crashing/garbling both media decode twins and the frame
  sampler (plain int64 casts of NaN);
- salted avg decomposed as sum/count(*) counting NULL readings as zeros;
- Spark max_by returning a NULL value at the max key where the oracle's
  arg_max skips NULLs (range_position's "latest");
- dup_span_trim dropping NULL-text documents from its audit output.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
import pytest

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# NULL-sensitive representatives from every family the corpus stresses.
QUERIES = [
    "range_position", "salted_grouped_stats", "array_element_extract",
    "knn_brute_force", "embedding_neardup_topk", "media_frame_sample",
    "media_feature_extract", "media_feature_extract_arrow",
    "media_kind_stats", "media_dedup_hash",
    "gopher_quality_flags", "text_quality", "lang_id",
    "dup_span_report", "dup_span_trim", "dedup_exact", "doc_fingerprint",
    "token_count", "unigram_logprob_score", "context_windows_report",
    "pack_sequences", "temperature_resample_docs",
    "sessionize_events", "scd2_user_state_intervals", "event_funnel",
    "daily_event_gapfill", "value_counts",
    # r5 widening: the remaining oracle-backed corpus queries
    "curation_attrition_report", "corpus_curation_full",
    "lang_confusion_report", "vocabulary_build", "tfidf_top_terms",
    "encode_docs_to_ids", "boilerplate_ngrams", "quality_mixture_sample",
    "ngram_novelty_report", "weighted_sample_docs",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    import random
    import shutil

    import numpy as np

    rng = random.Random(42)
    out = tmp_path_factory.mktemp("sffuzz")
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
             "theta", "the", "a", "of", "and"]
    docs = []

    def add(text, lang="en", source="srcA"):
        docs.append((len(docs), text, lang, source,
                     len(text) if text is not None else None))

    add("")                                  # empty text
    add("word")                              # single word
    add(" ".join(["dup"] * 10))              # ten identical words
    add(" ".join(vocab[:10]))                # exactly window-size words
    add(" ".join(vocab[:9]))                 # window-size minus one
    add(None, lang=None, source="srcB")      # NULL text + NULL lang
    add("back\\slash 'quote' stuff here ok "
        + " ".join(rng.choices(vocab, k=12)))
    add("   leading and trailing   spaces   ")
    add("\t tab\tseparated tokens here \t")
    big = " ".join(rng.choices(vocab, k=300))
    add(big, source="srcB")
    add(big, source="srcB")                  # exact duplicate pair
    add(big.replace("alpha", "omega", 1), source="srcB")  # near dup
    for _ in range(30):
        add(" ".join(rng.choices(vocab, k=rng.randint(15, 60))),
            lang=rng.choice(["en", "de", "fr"]),
            source=rng.choice(["srcA", "srcB", "srcC"]))
    pdf = pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["n_chars"] = pdf["n_chars"].astype("Int64")
    pdf.to_parquet(out / "documents.parquet", index=False)

    ev, eid = [], 0
    base = pd.Timestamp("2024-03-01 00:00:00")
    for u in range(1, 6):
        t = base
        for k in range(rng.randint(1, 12)):
            t = t + pd.Timedelta(seconds=rng.randint(0, 3600))
            ev.append((eid, t, u,
                       rng.choice(["view", "click", "purchase", "error"]),
                       round(rng.uniform(0, 100), 2),
                       '{"k": %d}' % k))
            eid += 1
    ts_tie = base + pd.Timedelta(days=1)     # tied timestamps, one user
    for _ in range(3):
        ev.append((eid, ts_tie, 77, "click", 1.0, None)); eid += 1
    ev.append((eid, ts_tie, 77, "purchase", 5.0, None)); eid += 1
    # single-event user with NULL value
    ev.append((eid, base + pd.Timedelta(days=2), 99, "view", None, "{}"))
    epdf = pd.DataFrame(
        ev, columns=["event_id", "ts", "user_id", "event_type",
                     "value", "props"])
    epdf.to_parquet(out / "events.parquet", index=False)

    em = [(i, np.array([rng.gauss(0, 1) for _ in range(8)],
                       dtype=np.float32), i % 3) for i in range(12)]
    em.append((12, np.zeros(8, dtype=np.float32), 0))   # zero vector
    pd.DataFrame(em, columns=["vec_id", "embedding", "label"]) \
        .to_parquet(out / "embeddings.parquet", index=False)

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    out / f"{t}.parquet")
    return str(out)


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{adv_dir}/{t}.parquet'")
    yield con
    con.close()


def _canon(x):
    if x is None or x is pd.NA or (pd.api.types.is_scalar(x)
                                   and pd.isna(x)):
        return "<NULL>"
    if isinstance(x, (datetime.date, datetime.datetime, pd.Timestamp)):
        s = pd.Timestamp(x).isoformat()
        # DuckDB renders a DATE column as a midnight Timestamp in pandas;
        # strip the zero time so date/timestamp representations compare.
        return s[:-9] if s.endswith("T00:00:00") else s
    if isinstance(x, float):
        if math.isinf(x):
            return "inf" if x > 0 else "-inf"
        return str(round(x, 6))
    return str(x)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # dtype=object even when empty: map() preserves the numeric dtype of
    # an empty column, making two identical empty frames compare unequal.
    r = pd.DataFrame({c: pd.Series(df[c].map(_canon), dtype="object")
                      for c in df.columns})
    return r.sort_values(list(r.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", QUERIES)
def test_adversarial_parity(spark, adv_dir, adv_duck, name):
    from data_pipelines_course_spark.queries import all_oracles, all_queries

    queries, oracles = all_queries(), all_oracles()
    sp = queries[name](spark, adv_dir).toPandas()
    du = adv_duck.sql(oracles[name]).df()
    assert len(sp) == len(du), (len(sp), len(du))
    assert sorted(sp.columns) == sorted(du.columns)
    a, b = _norm(sp), _norm(du)
    if not a.equals(b):
        neq = (a != b)
        bad = {c: int(neq[c].sum()) for c in a.columns if neq[c].any()}
        raise AssertionError(
            f"{name}: value mismatch in {bad};\n"
            f"spark: {a[neq.any(axis=1)].head(3).to_dict('records')}\n"
            f"duck:  {b[neq.any(axis=1)].head(3).to_dict('records')}")


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("sfempty")
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64())}), out / "documents.parquet")
    pq.write_table(pa.table({
        "event_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64()),
        "props": pa.array([], pa.string())}), out / "events.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
        "label": pa.array([], pa.int32())}), out / "embeddings.parquet")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    out / f"{t}.parquet")
    return str(out)


@pytest.mark.parametrize("name", [
    # The four that crashed on a zero-row corpus before the round-4
    # guards (no sink output on disk / None bounds / None probe vector),
    "scd2_stream_convergence", "rollup_stream_convergence",
    "trending_topk_stream_convergence", "knn_brute_force",
    # plus cheap representatives proving the relational paths degrade
    # to empty results, not errors.
    "dedup_exact", "dup_span_report", "sessionize_events",
    "temperature_resample_docs",
    # r5 widening: the corpus pipeline + text-prep family on first-run
    # emptiness (vocab/tfidf aggregates, the attrition funnel).
    "curation_attrition_report", "corpus_curation_full",
    "vocabulary_build", "tfidf_top_terms", "encode_docs_to_ids",
    "lang_confusion_report",
])
def test_empty_corpus_parity(spark, empty_dir, name):
    """A zero-row corpus must produce the oracle's answer (empty result
    or an all-zero summary), never a crash — the behavior an incremental
    pipeline hits on its very first run."""
    from data_pipelines_course_spark.queries import all_oracles, all_queries

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{empty_dir}/{t}.parquet'")
    try:
        sp = all_queries()[name](spark, empty_dir).toPandas()
        du = con.sql(all_oracles()[name]).df()
        assert len(sp) == len(du)
        assert _norm(sp).equals(_norm(du))
    finally:
        con.close()


@pytest.fixture(scope="module")
def uni_dir(tmp_path_factory):
    import random
    import shutil

    rng = random.Random(5)
    out = tmp_path_factory.mktemp("sfuni")
    docs = []

    def add(text, lang="en", source="srcA"):
        docs.append((len(docs), text, lang, source, len(text)))

    add("héllo wörld çafé naïve résumé " * 4, "fr")      # accents
    add("日本語のテキストには空白がありません" * 3, "zh")   # CJK, no spaces
    add("mixed 日本語 and english words ここ tokens", "zh")
    add("emoji 😀 tokens 🎉 here 🚀 twice 😀 end", "en")
    add("combining á é vs precomposed á é", "en")  # NFC vs NFD
    add("ß STRASSE straße Straße", "de")
    add("tab nbsp thin　ideographic spaces", "en")  # exotic whitespace
    add("zero​width​joined words", "en")                # U+200B
    add("𝔪𝔞𝔱𝔥 𝕤𝕪𝕞𝕓𝕠𝕝𝕤 and surrogate 𠀀 pairs", "en")  # astral plane
    vocab = ["alpha", "beta", "gamma", "naïve", "café", "日本", "😀",
             "λόγος", "мир"]
    for _ in range(25):
        add(" ".join(rng.choices(vocab, k=rng.randint(10, 40))),
            rng.choice(["en", "de", "fr", "zh"]),
            rng.choice(["srcA", "srcB"]))
    pd.DataFrame(docs,
                 columns=["doc_id", "text", "lang", "source", "n_chars"]) \
        .to_parquet(out / "documents.parquet", index=False)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    out / f"{t}.parquet")
    return str(out)


@pytest.mark.parametrize("name", [
    "wordcount", "topk_words", "text_quality", "lang_id",
    "doc_fingerprint", "token_count", "dedup_exact", "dup_span_report",
    "dup_span_trim", "repetition_ratio", "type_token_ratio_by_source",
    "vocabulary_build", "pii_redaction", "boilerplate_ngrams",
    "encode_docs_to_ids", "unigram_logprob_score", "gopher_quality_flags",
    "context_windows_report", "pack_sequences", "doc_length_stats",
    "lang_confusion_report", "temperature_resample_docs",
    "ngram_novelty_report", "tfidf_top_terms",
    # r5 widening: the Jaccard/decontamination family (multibyte
    # shingles; a spaceless CJK doc is ONE giant token) and the full
    # curation pipeline + funnel.
    "ngram_jaccard_topk", "ngram_jaccard_threshold",
    "ngram_jaccard_threshold_prefix", "decontaminate_exact",
    "decontaminate_ngram_hit", "corpus_curation_full",
    "curation_attrition_report", "quality_mixture_sample",
])
def test_unicode_corpus_parity(spark, uni_dir, name):
    """Multibyte text (CJK without spaces, emoji, combining marks, astral
    symbols, exotic whitespace) flows through the whole text family with
    value-exact oracle parity — byte lengths, char counts, md5s, window
    hashes and token identities all agree. The corpus deliberately
    EXCLUDES the two characters where the engines' lower() definitions
    legitimately differ (see test_known_casefold_divergence)."""
    from data_pipelines_course_spark.queries import all_oracles, all_queries

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{uni_dir}/{t}.parquet'")
    try:
        sp = all_queries()[name](spark, uni_dir).toPandas()
        du = con.sql(all_oracles()[name]).df()
        assert len(sp) == len(du), (len(sp), len(du))
        assert _norm(sp).equals(_norm(du))
    finally:
        con.close()


def test_known_casefold_divergence(spark):
    """Documented oracle LIMIT, pinned so it can't silently change: the
    engine lowercases with the full Unicode case mapping (U+0130 'İ' →
    'i' + combining dot; contextual final sigma), while the oracle's
    simple 1:1 mapping gives 'i' / non-final sigma. The ENGINE side is
    the Unicode-conformant one; corpora containing these characters
    diverge from the DuckDB oracle on any lowercased-token query (found
    by the unicode sweep, round 4). If either engine changes behavior,
    this test fails and the adversarial corpus should be revisited."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("İstanbul",), ("ΣΟΦΟΣ",)], "s string")
    got = {r["s"]: r["l"] for r in
           df.select("s", F.lower("s").alias("l")).collect()}
    assert got["İstanbul"] == "i̇stanbul"   # full mapping: i + U+0307
    assert got["ΣΟΦΟΣ"].endswith("ς")       # contextual final sigma
    con = duckdb.connect()
    try:
        assert con.sql("SELECT lower('İstanbul')").fetchone()[0] \
            == "istanbul"                         # simple mapping
        assert con.sql("SELECT lower('ΣΟΦΟΣ')").fetchone()[0] \
            .endswith("σ")                   # plain sigma
    finally:
        con.close()


def test_known_whitespace_class_divergence(spark):
    """Documented oracle LIMIT #2 (review r4): Java's \\s (Spark split)
    includes vertical tab U+000B; RE2's \\s (DuckDB string_split_regex)
    does not — so a corpus containing \\x0B tokenizes differently across
    engines on every whitespace-split query. Like the case-fold
    divergence this is an oracle limitation, not an engine defect
    (neither class covers Unicode spaces like NBSP — those stay inside
    tokens CONSISTENTLY on both engines, covered by the unicode corpus).
    Pinned so a change in either engine's regex semantics is noticed."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a\x0bb nbsp c",)], "s string")
    toks = df.select(F.split(F.col("s"), r"\s+").alias("t")).head()["t"]
    assert toks == ["a", "b", "nbsp c"]      # Java: \x0B splits, NBSP not
    con = duckdb.connect()
    try:
        d = con.sql(
            "SELECT string_split_regex('a\x0bb nbsp c', '\\s+')"
        ).fetchone()[0]
        assert d == ["a\x0bb", "nbsp c"]     # RE2: \x0B does NOT split
    finally:
        con.close()


def test_known_grouping_sets_empty_input_divergence(spark):
    """Documented engine-semantics divergence #3 (found by fuzz grammar
    v8, seeds 11/27/30, round 9; promoted to a product-level pin per
    the r9 verdict): over an EMPTY input relation, the SQL standard —
    and DuckDB — emit the grand-total grouping-set row for ROLLUP/CUBE
    (the () set aggregates the empty input like a global aggregate:
    cnt=0, all keys NULL), while Spark's rollup()/cube()/GROUPING SETS
    with () emit ZERO rows. Spark's plain global df.groupBy().agg()
    DOES return the 1 row, so the asymmetry is specific to the Expand-
    based grouping-sets path. Practical consequence a user of
    `rollup_agg`/`cube_agg` can hit: a filter matching nothing silently
    drops the grand-total row instead of reporting cnt=0. The fuzz v8
    oracle aligns via a `HAVING count(*) > 0` guard (a no-op on
    non-empty input); this pin notices if either engine changes."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([], "k string, v string, x long")
    empty = df.where(F.lit(False))
    # Spark: grouping-sets paths emit ZERO rows over empty input...
    assert empty.rollup("k", "v").agg(F.count(F.lit(1)).alias("cnt")) \
        .count() == 0
    assert empty.cube("k", "v").agg(F.count(F.lit(1)).alias("cnt")) \
        .count() == 0
    # ...but the plain global aggregate DOES return its 1 row.
    assert empty.groupBy().agg(F.count(F.lit(1)).alias("cnt")) \
        .count() == 1
    con = duckdb.connect()
    try:
        # DuckDB follows the standard: ROLLUP/CUBE over empty input emit
        # the grand-total () row; sets WITHOUT () emit zero rows.
        rows = con.sql(
            "SELECT k, v, count(*) AS cnt FROM (SELECT 'a' AS k, 'b' AS v"
            " WHERE false) GROUP BY ROLLUP (k, v)").fetchall()
        assert rows == [(None, None, 0)]
        rows = con.sql(
            "SELECT k, v, count(*) AS cnt FROM (SELECT 'a' AS k, 'b' AS v"
            " WHERE false) GROUP BY CUBE (k, v)").fetchall()
        assert rows == [(None, None, 0)]
        rows = con.sql(
            "SELECT k, v, count(*) AS cnt FROM (SELECT 'a' AS k, 'b' AS v"
            " WHERE false) GROUP BY GROUPING SETS ((k), (v))").fetchall()
        assert rows == []
        # The v8 oracle guard is a no-op on non-empty input and removes
        # exactly the standard's empty-input grand-total row.
        rows = con.sql(
            "SELECT k, v, count(*) AS cnt FROM (SELECT 'a' AS k, 'b' AS v"
            " WHERE false) GROUP BY ROLLUP (k, v)"
            " HAVING count(*) > 0").fetchall()
        assert rows == []
    finally:
        con.close()


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """Skew axis committed as a fixture (r5; the r4 sweep ran ad-hoc):
    one bot user with 5000 events among 20 normal users, one source
    holding ~95% of documents, and a 5000-token giant doc beside
    normal-length ones."""
    import random
    import shutil

    rng = random.Random(11)
    out = tmp_path_factory.mktemp("sfskew")
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
             "the", "a", "of"]
    docs = []

    def add(text, lang="en", source="big"):
        docs.append((len(docs), text, lang, source, len(text)))

    add(" ".join(rng.choices(vocab, k=5000)))          # the giant doc
    for _ in range(190):                               # 95% one source
        add(" ".join(rng.choices(vocab, k=rng.randint(15, 60))))
    for _ in range(10):
        add(" ".join(rng.choices(vocab, k=rng.randint(15, 60))),
            source=rng.choice(["tailA", "tailB"]))
    pd.DataFrame(docs,
                 columns=["doc_id", "text", "lang", "source", "n_chars"]) \
        .to_parquet(out / "documents.parquet", index=False)

    ev, eid = [], 0
    base = pd.Timestamp("2024-03-01 00:00:00")
    t = base
    for _ in range(5000):                              # the bot user
        t = t + pd.Timedelta(seconds=rng.randint(1, 120))
        ev.append((eid, t, 1,
                   rng.choice(["view", "click", "purchase"]),
                   round(rng.uniform(0, 10), 2), "{}"))
        eid += 1
    for u in range(2, 22):                             # normal users
        t = base
        for k in range(rng.randint(2, 15)):
            t = t + pd.Timedelta(seconds=rng.randint(60, 7200))
            ev.append((eid, t, u,
                       rng.choice(["view", "click", "purchase", "error"]),
                       round(rng.uniform(0, 100), 2), '{"k": %d}' % k))
            eid += 1
    pd.DataFrame(ev, columns=["event_id", "ts", "user_id", "event_type",
                              "value", "props"]) \
        .to_parquet(out / "events.parquet", index=False)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    out / f"{t}.parquet")
    return str(out)


@pytest.mark.parametrize("name", [
    # bounded-state event designs through the bot user's history
    "sessionize_events", "scd2_user_state_intervals", "event_funnel",
    "retention_cohorts", "daily_event_gapfill", "salted_grouped_stats",
    "range_position",
    # corpus ops through source skew + the giant doc
    "pack_sequences", "temperature_resample_docs", "dup_span_report",
    "dup_span_trim", "curation_attrition_report", "weighted_sample_docs",
    "context_windows_report", "gopher_quality_flags",
])
def test_skew_corpus_parity(spark, skew_dir, name):
    """A 5000-event bot user and a 95%-one-source corpus with a giant
    doc must stay value-exact: the bounded-state window designs hold
    through the hot key, and sampling/packing/span-dedup stay exact
    under source skew."""
    from data_pipelines_course_spark.queries import all_oracles, all_queries

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{skew_dir}/{t}.parquet'")
    try:
        sp = all_queries()[name](spark, skew_dir).toPandas()
        du = con.sql(all_oracles()[name]).df()
        assert len(sp) == len(du), (len(sp), len(du))
        assert _norm(sp).equals(_norm(du))
    finally:
        con.close()


# ---------------------------------------------------------------------------
# Axis 6 (r5): timestamp extremes. A 100 TB crawl's event-time column is
# full of garbage a clean generator never produces: epoch-0 placeholders
# (the single most common bad timestamp in the wild), pre-1970 values
# (negative epoch seconds), far-future values, sub-second precision, and
# sessions/conversions that SPAN the epoch boundary (negative->positive
# arithmetic). Every date-derived key (sessions, SCD2 intervals, day
# partitions, cohort months, sliding windows) must stay value-exact vs
# the oracle across all of them.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def epoch_dir(tmp_path_factory):
    import shutil

    out = tmp_path_factory.mktemp("sfepoch")
    T = pd.Timestamp
    ev, eid = [], 0

    def add(ts, u, et, v, props="{}"):
        nonlocal eid
        ev.append((eid, ts, u, et, v, props))
        eid += 1

    epoch0 = T("1970-01-01 00:00:00")
    # u1 — the epoch-0 placeholder user: five TIED events at exactly 0.
    for et, v in [("view", 1.0), ("click", 2.0), ("purchase", 30.0),
                  ("view", 3.0), ("click", 4.0)]:
        add(epoch0, 1, et, v)
    # u2 — one session SPANNING the epoch boundary (gaps < 30 min), then
    # a separate session the next day; click->purchase across zero.
    add(T("1969-12-31 23:45:00"), 2, "view", 5.0)
    add(T("1969-12-31 23:55:00"), 2, "click", 1.5)
    add(T("1970-01-01 00:05:00"), 2, "purchase", 42.0)
    add(T("1970-01-01 00:20:00"), 2, "view", 2.0)
    add(T("1970-01-02 09:00:00"), 2, "view", 7.0)
    # u3 — deep past (negative epoch): 1900 events, conversion 69 years
    # after the click.
    add(T("1900-01-01 00:00:00"), 3, "view", 1.0)
    add(T("1900-01-01 01:00:00"), 3, "click", 2.5)
    add(T("1969-06-01 12:34:56"), 3, "purchase", 99.0)
    # u4 — far future, with sub-second (exact-millisecond) precision.
    add(T("2250-01-01 00:00:00"), 4, "view", 1.0)
    add(T("2250-01-01 00:00:00.123000"), 4, "click", 2.0)
    add(T("2250-01-01 01:00:00"), 4, "purchase", 10.0)
    # u5 — normal modern events at millisecond edges.
    add(T("2024-06-01 12:00:00.001000"), 5, "click", 1.0)
    add(T("2024-06-01 12:30:00.999000"), 5, "purchase", 55.0)
    add(T("2024-06-01 13:30:00"), 5, "error", None)
    # u6 — single epoch-0 event with NULL value.
    add(epoch0, 6, "view", None, None)
    pd.DataFrame(ev, columns=["event_id", "ts", "user_id", "event_type",
                              "value", "props"]) \
        .to_parquet(out / "events.parquet", index=False)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    out / f"{t}.parquet")
    return str(out)


@pytest.mark.parametrize("name", [
    # event-time designs across the epoch boundary
    "sessionize_events", "scd2_user_state_intervals",
    "asof_join_latest_click", "range_join_click_count",
    "conversion_lag_native", "cogroup_conversion_lag",
    # date-derived keys: day partitions (350-year gapfill spine), hours,
    # datetime parts, cohort months
    "daily_event_gapfill", "grouped_hour_sum", "derived_datetime_parts",
    "retention_cohorts", "event_funnel",
    # ordered windows over negative epochs
    "window_first_last_ratio", "lag_lead_delta", "moving_average",
    "range_position",
    # the maintenance sinks: date/window partition VALUES become
    # directory names (event_date=1900-01-01/), and the epoch-grid
    # sliding windows must align for negative epochs too
    "scd2_stream_convergence", "rollup_stream_convergence",
    "trending_topk_stream_convergence",
])
def test_epoch_extremes_parity(spark, epoch_dir, name):
    """Epoch-0 ties, pre-1970 sessions, far-future sub-second events:
    every date/time-derived result must stay value-exact vs DuckDB."""
    from data_pipelines_course_spark.queries import all_oracles, all_queries

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{epoch_dir}/{t}.parquet'")
        sp = all_queries()[name](spark, epoch_dir).toPandas()
        du = con.sql(all_oracles()[name]).df()
    finally:
        con.close()
    assert len(sp) == len(du), (len(sp), len(du))
    assert sorted(sp.columns) == sorted(du.columns)
    a, b = _norm(sp), _norm(du)
    if not a.equals(b):
        neq = (a != b)
        bad = {c: int(neq[c].sum()) for c in a.columns if neq[c].any()}
        raise AssertionError(
            f"{name}: value mismatch in {bad};\n"
            f"spark: {a[neq.any(axis=1)].head(3).to_dict('records')}\n"
            f"duck:  {b[neq.any(axis=1)].head(3).to_dict('records')}")


# ---------------------------------------------------------------------------
# Axis 7 (r5): broken referential integrity. Real warehouse feeds violate
# the clean-FK assumptions TPC-H data is generated under: NULL join keys
# (the NOT IN / anti-join trap), dangling foreign keys on both sides,
# orders without lineitems and lineitems without orders, NULL grouping
# keys, NULL measures, and all-NULL dimension attributes. Every join,
# decorrelated subquery (q16/q20/q21/q22 rewrites), window and aggregate
# must stay value-exact vs the ANSI oracle on such a corpus — NULL
# semantics in joins and set ops are exactly where a DataFrame rewrite
# of correlated SQL silently diverges.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ri_dir(tmp_path_factory):
    import shutil

    out = tmp_path_factory.mktemp("sfri")
    base = "/root/testdata/sf0.001"
    T = pd.Timestamp

    def app(df, rows):
        import warnings

        with warnings.catch_warnings():
            # concat of an all-NA crafted row vs a typed frame warns about
            # future dtype inference; the explicit astype() calls below pin
            # every nullable column's dtype regardless.
            warnings.simplefilter("ignore", FutureWarning)
            return pd.concat([df, pd.DataFrame(rows)], ignore_index=True)

    orders = pd.read_parquet(f"{base}/orders.parquet")
    orders = app(orders, [
        # NULL custkey; dangling custkey; NULL totalprice/date/priority;
        # 9000001 is also an order with NO lineitems
        dict(o_orderkey=9000001, o_custkey=None, o_orderstatus="O",
             o_totalprice=123.45, o_orderdate=T("1996-01-02"),
             o_orderpriority="1-URGENT"),
        dict(o_orderkey=9000002, o_custkey=999999, o_orderstatus="F",
             o_totalprice=None, o_orderdate=T("1994-06-01"),
             o_orderpriority=None),
        dict(o_orderkey=9000003, o_custkey=1, o_orderstatus="O",
             o_totalprice=50.0, o_orderdate=None, o_orderpriority="5-LOW"),
    ])
    orders["o_custkey"] = orders["o_custkey"].astype("Int64")
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[us]")

    li = pd.read_parquet(f"{base}/lineitem.parquet")
    li = app(li, [
        # NULL part/supp keys + NULL grouping key (l_returnflag)
        dict(l_orderkey=9000002, l_partkey=None, l_suppkey=None,
             l_linenumber=1, l_quantity=5.0, l_extendedprice=100.0,
             l_discount=0.05, l_tax=0.02, l_returnflag=None,
             l_linestatus="F", l_shipdate=T("1994-07-01")),
        # dangling part/supp keys + every measure NULL + NULL shipdate
        dict(l_orderkey=9000002, l_partkey=999999, l_suppkey=9999,
             l_linenumber=2, l_quantity=None, l_extendedprice=None,
             l_discount=None, l_tax=None, l_returnflag="R",
             l_linestatus="F", l_shipdate=None),
        # lineitem whose order does not exist
        dict(l_orderkey=8888888, l_partkey=1, l_suppkey=1, l_linenumber=1,
             l_quantity=10.0, l_extendedprice=1000.0, l_discount=0.1,
             l_tax=0.0, l_returnflag="N", l_linestatus="O",
             l_shipdate=T("1995-09-15")),
    ])
    for c, t in [("l_partkey", "Int64"), ("l_suppkey", "Int64"),
                 ("l_linenumber", "Int32")]:
        li[c] = li[c].astype(t)
    li["l_shipdate"] = li["l_shipdate"].astype("datetime64[us]")

    cust = pd.read_parquet(f"{base}/customer.parquet")
    cust = app(cust, [
        dict(c_custkey=900001, c_name="Customer#900001", c_nationkey=None,
             c_acctbal=None, c_mktsegment=None),
        dict(c_custkey=900002, c_name="Customer#900002", c_nationkey=98,
             c_acctbal=-1.0, c_mktsegment="BUILDING"),
    ])
    cust["c_nationkey"] = cust["c_nationkey"].astype("Int32")

    supp = pd.read_parquet(f"{base}/supplier.parquet")
    supp = app(supp, [
        dict(s_suppkey=9001, s_name="Supplier#9001", s_nationkey=None,
             s_acctbal=None),
        dict(s_suppkey=9002, s_name="Supplier#9002", s_nationkey=97,
             s_acctbal=0.0),
    ])
    supp["s_nationkey"] = supp["s_nationkey"].astype("Int32")

    part = pd.read_parquet(f"{base}/part.parquet")
    part = app(part, [
        dict(p_partkey=900001, p_name=None, p_brand=None, p_type=None,
             p_size=None, p_retailprice=None),
    ])
    part["p_size"] = part["p_size"].astype("Int32")

    orders.to_parquet(out / "orders.parquet", index=False)
    li.to_parquet(out / "lineitem.parquet", index=False)
    cust.to_parquet(out / "customer.parquet", index=False)
    part.to_parquet(out / "part.parquet", index=False)
    supp.to_parquet(out / "supplier.parquet", index=False)
    for t in ["region", "nation", "events", "documents", "embeddings"]:
        shutil.copy(f"{base}/{t}.parquet", out / f"{t}.parquet")
    return str(out)


RI_QUERIES = [
    # the full TPC-H surface (incl. the decorrelated subquery rewrites)
    "tpch_q1_pricing_summary", "tpch_q2_top_acctbal_per_nation",
    "tpch_q3_unshipped_revenue", "tpch_q4_late_shipment_priority",
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume", "tpch_q8_market_share",
    "tpch_q9_product_profit", "tpch_q10_returned_items",
    "tpch_q11_important_parts", "tpch_q12_priority_shipping",
    "tpch_q13_order_distribution", "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier", "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue", "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue", "tpch_q20_part_promotion_suppliers",
    "tpch_q21_waiting_suppliers", "tpch_q22_global_sales_opportunity",
    # joins / set ops / windows / aggregates over the same tables
    "broadcast_join", "join_multiway_revenue", "salted_join_segment_revenue",
    "semi_join_active_customers", "except_inactive_customers",
    "intersect_nation_keys", "topk_orders_per_segment",
    "lateral_topk_per_nation", "sql_region_revenue",
    "customer_value_deciles", "rank_customers", "rolling_7day_customer_spend",
    "snapshot_diff_orders", "table_profile_orders", "pivot_status_counts",
    "unpivot_part_attrs", "minmax_scale_by_group", "dispersion_stats",
    "flagship_grouped_agg", "price_quantiles", "quantity_quantiles_by_flag",
    "cube_agg", "rollup_agg", "grouping_sets_agg", "distinct_count",
    "grouped_count", "global_minmax", "case_when_bucket",
    "filter_date_window", "sort_by_computed", "tail_slice",
    "literal_and_cast", "derived_datetime_parts",
]


@pytest.mark.parametrize("name", RI_QUERIES)
def test_broken_ri_parity(spark, ri_dir, name):
    """NULL keys, dangling FKs, childless/parentless rows, NULL group
    keys and NULL measures: every relational query stays value-exact."""
    from data_pipelines_course_spark.queries import all_oracles, all_queries

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{ri_dir}/{t}.parquet'")
        sp = all_queries()[name](spark, ri_dir).toPandas()
        du = con.sql(all_oracles()[name]).df()
    finally:
        con.close()
    assert len(sp) == len(du), (len(sp), len(du))
    assert sorted(sp.columns) == sorted(du.columns)
    a, b = _norm(sp), _norm(du)
    if not a.equals(b):
        neq = (a != b)
        bad = {c: int(neq[c].sum()) for c in a.columns if neq[c].any()}
        raise AssertionError(
            f"{name}: value mismatch in {bad};\n"
            f"spark: {a[neq.any(axis=1)].head(3).to_dict('records')}\n"
            f"duck:  {b[neq.any(axis=1)].head(3).to_dict('records')}")


# ---------------------------------------------------------------------------
# Axis 8 (r5): malformed JSON payloads. A raw event feed's props column
# contains truncated documents, unquoted keys, bare garbage, empty
# strings, non-object JSON, wrong-case keys and out-of-range numbers.
# The three access paths (typed from_json, schema-free variant, map
# profile) must all DEGRADE to NULL/row-drop instead of erroring — and
# must agree with the guarded oracle. The four coercion edges where the
# engines genuinely disagree are pinned in
# test_json_coercion_divergence below.
# ---------------------------------------------------------------------------

_JSON_AGREEING_PROPS = [
    '{"k": 1}',             # well-formed
    '{"k": }',              # malformed value
    '{k: 2}',               # unquoted key
    '{"k": 3',              # truncated
    'not json at all',      # garbage
    '',                     # empty string
    None,                   # NULL
    '[1, 2, 3]',            # valid JSON, not an object
    '"just a string"',      # valid JSON scalar
    '{"k": "notanint"}',    # non-numeric string where int expected
    '{"k": null}',          # explicit null
    '{"K": 5}',             # wrong-case key
    '{"nested": {"k": 9}}', # k at the wrong depth
    '{"k": 2147483648}',    # int32 overflow
    '{"k": -1}',
    '{"k": 0}',
]


@pytest.fixture(scope="module")
def badjson_dir(tmp_path_factory):
    import shutil

    out = tmp_path_factory.mktemp("sfjson")
    base = "/root/testdata/sf0.001"
    rows = [(i, pd.Timestamp("2024-03-01") + pd.Timedelta(minutes=i),
             i % 3, "view", float(i), p)
            for i, p in enumerate(_JSON_AGREEING_PROPS)]
    pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type",
                                "value", "props"]) \
        .to_parquet(out / "events.parquet", index=False)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"]:
        shutil.copy(f"{base}/{t}.parquet", out / f"{t}.parquet")
    return str(out)


@pytest.mark.parametrize("name", [
    "json_extract_props", "json_group_by_key", "variant_props_extract",
    "props_map_stats",
])
def test_malformed_json_parity(spark, badjson_dir, name):
    """Malformed/hostile props must degrade to NULLs (never a job
    failure) and stay value-exact vs the json_valid-guarded oracle."""
    from data_pipelines_course_spark.queries import all_oracles, all_queries

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{badjson_dir}/{t}.parquet'")
        sp = all_queries()[name](spark, badjson_dir).toPandas()
        du = con.sql(all_oracles()[name]).df()
    finally:
        con.close()
    assert len(sp) == len(du), (len(sp), len(du))
    assert sorted(sp.columns) == sorted(du.columns)
    a, b = _norm(sp), _norm(du)
    if not a.equals(b):
        neq = (a != b)
        bad = {c: int(neq[c].sum()) for c in a.columns if neq[c].any()}
        raise AssertionError(
            f"{name}: value mismatch in {bad};\n"
            f"spark: {a[neq.any(axis=1)].head(4).to_dict('records')}\n"
            f"duck:  {b[neq.any(axis=1)].head(4).to_dict('records')}")


def test_json_coercion_divergence(spark):
    """Documented cross-engine divergence pin #3 (beside the Unicode
    casefold and \\s-class pins): the four JSON coercion edges where the
    three access paths legitimately disagree. from_json (typed schema)
    refuses all implicit coercions (-> NULL); the VARIANT path applies
    cast semantics (truncates 1.9 -> 1, true -> 1, '7' -> 7) but rejects
    duplicate-key objects; DuckDB's TRY_CAST of the extracted string
    ROUNDS '1.9' -> 2 and takes the FIRST duplicate key while from_json
    takes the LAST. These inputs are excluded from the axis-8 corpus;
    this pin fails if any engine's behavior drifts."""
    from pyspark.sql import functions as F

    cases = ['{"k": 1.9}', '{"k": 1, "k": 2}', '{"k": true}', '{"k": "7"}']
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, props string")
    got = {r["i"]: (r["fj"], r["tv"]) for r in df.select(
        "i",
        F.from_json("props", "k int").getField("k").alias("fj"),
        F.try_variant_get(F.try_parse_json("props"), "$.k", "int")
        .alias("tv")).collect()}
    assert got == {0: (None, 1), 1: (2, None), 2: (None, 1), 3: (None, 7)}

    con = duckdb.connect()
    try:
        duck = [con.sql(
            "SELECT TRY_CAST(json_extract_string($1, '$.k') AS INTEGER)",
            params=[c]).fetchone()[0] for c in cases]
    finally:
        con.close()
    assert duck == [2, 1, None, 7]


# ---------------------------------------------------------------------------
# Axis 9 (r5): primary-key violations. At-least-once ingestion re-delivers
# rows (same key, same payload) and broken upstreams re-ASSIGN keys (same
# key, conflicting payload). The sweep over all 146 oracle-backed queries
# found a crisp boundary: the relational/event family (all 22 TPC-H,
# SCD2, sessionization, as-of joins, aggregates) is hash-exact on such a
# corpus, while the per-document digest family (shingle/Jaccard dedup,
# decontamination, span reports, kNN) computes digests PER ROW and
# legitimately diverges from any entity-keyed oracle when one doc_id
# carries two texts — doc_id/vec_id uniqueness is that family's declared
# PRECONDITION, detected upstream by audit.key_uniqueness_report.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pk_dir(tmp_path_factory):
    import shutil

    out = tmp_path_factory.mktemp("sfpk")
    base = "/root/testdata/sf0.001"

    docs = pd.read_parquet(f"{base}/documents.parquet")
    d0 = docs.iloc[0].copy()
    d0["text"] = "conflicting payload for a duplicated key"
    d0["source"] = "dupsrc"
    d1 = docs.iloc[1].copy()                 # exact full-row re-delivery
    docs = pd.concat([docs, pd.DataFrame([d0, d1])], ignore_index=True)
    docs.to_parquet(out / "documents.parquet", index=False)

    ev = pd.read_parquet(f"{base}/events.parquet")
    e0 = ev.iloc[0].copy()
    e0["ts"] = e0["ts"] + pd.Timedelta(hours=1)
    e0["event_type"] = "purchase"            # conflicting payload
    e1 = ev.iloc[1].copy()                   # exact re-delivery
    ev = pd.concat([ev, pd.DataFrame([e0, e1])], ignore_index=True)
    ev["ts"] = ev["ts"].astype("datetime64[ns]")   # keep NANOS encoding
    ev.to_parquet(out / "events.parquet", index=False)

    orders = pd.read_parquet(f"{base}/orders.parquet")
    o0 = orders.iloc[0].copy()
    o0["o_totalprice"] = 1.23
    o0["o_orderdate"] = o0["o_orderdate"] + pd.Timedelta(days=40)
    orders = pd.concat([orders, pd.DataFrame([o0])], ignore_index=True)
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[us]")
    orders.to_parquet(out / "orders.parquet", index=False)

    cust = pd.read_parquet(f"{base}/customer.parquet")
    c0 = cust.iloc[0].copy()
    c0["c_acctbal"] = -500.0
    c0["c_mktsegment"] = "MACHINERY"
    cust = pd.concat([cust, pd.DataFrame([c0])], ignore_index=True)
    cust.to_parquet(out / "customer.parquet", index=False)

    for t in ["region", "nation", "supplier", "part", "lineitem",
              "embeddings"]:
        shutil.copy(f"{base}/{t}.parquet", out / f"{t}.parquet")
    return str(out)


@pytest.mark.parametrize("name", [
    # event-time designs over a duplicated event_id (one re-delivery,
    # one conflicting payload)
    "scd2_user_state_intervals", "sessionize_events",
    "asof_join_latest_click", "conversion_lag_native",
    "daily_event_gapfill", "value_counts", "json_group_by_key",
    # TPC-H / relational over a duplicated o_orderkey / c_custkey
    "tpch_q4_late_shipment_priority", "tpch_q13_order_distribution",
    "tpch_q18_large_orders", "customer_value_deciles", "rank_customers",
    "snapshot_diff_orders", "flagship_grouped_agg",
    # dedup_exact groups by md5(text), not doc_id — PK-safe by design
    "dedup_exact",
])
def test_pk_violation_relational_parity(spark, pk_dir, name):
    """The relational/event family declares NO key-uniqueness
    precondition: duplicated keys flow through joins, windows and
    aggregates with plain SQL multiplicity, hash-exact vs the oracle."""
    from data_pipelines_course_spark.queries import all_oracles, all_queries

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{pk_dir}/{t}.parquet'")
        sp = all_queries()[name](spark, pk_dir).toPandas()
        du = con.sql(all_oracles()[name]).df()
    finally:
        con.close()
    assert len(sp) == len(du), (len(sp), len(du))
    a, b = _norm(sp), _norm(du)
    assert a.equals(b), f"{name}: diverged on PK-violating corpus"


def test_pk_violations_are_detectable(spark, pk_dir):
    """audit.key_uniqueness_report catches every planted violation and
    distinguishes re-delivery (1 payload) from conflict (2 payloads) —
    the upstream gate the digest family's uniqueness precondition
    relies on."""
    from data_pipelines_course_spark.datasets import load
    from data_pipelines_course_spark.operators.audit import (
        key_uniqueness_report)

    got = {r["doc_id"]: (r["n_rows"], r["n_distinct_payloads"])
           for r in key_uniqueness_report(
               load(spark, pk_dir, "documents"), ["doc_id"]).collect()}
    docs0 = pd.read_parquet(f"{pk_dir}/documents.parquet")
    k0, k1 = int(docs0.iloc[0]["doc_id"]), int(docs0.iloc[1]["doc_id"])
    assert got[k0] == (2, 2) and got[k1] == (2, 1) and len(got) == 2

    ev_dups = {r["event_id"]: (r["n_rows"], r["n_distinct_payloads"])
               for r in key_uniqueness_report(
                   load(spark, pk_dir, "events"), ["event_id"]).collect()}
    assert sorted(v for v in ev_dups.values()) == [(2, 1), (2, 2)]

    # clean table -> empty report. (supplier, not lineitem: the driver
    # generator does NOT honor TPC-H's composite (l_orderkey,
    # l_linenumber) PK — the real testdata carries >1k duplicate pairs,
    # which is itself a fact this audit surfaces.)
    assert key_uniqueness_report(
        load(spark, pk_dir, "supplier"), ["s_suppkey"]).count() == 0


def test_key_uniqueness_digest_is_null_position_safe(spark):
    """The payload digest must NOT alias rows whose NULLs sit in
    different columns: Spark's hash expressions skip null inputs, so a
    raw xxhash64(c1, c2) maps (k,'a',NULL) and (k,NULL,'a') to the SAME
    hash and a conflicting-payload violation would be misreported as
    benign re-delivery (n_distinct_payloads=1) — ADVICE r5. The
    NULL-disambiguated encoding keeps them distinct, while an exact
    re-delivered pair (including its NULLs) still counts as one
    payload."""
    from data_pipelines_course_spark.operators.audit import (
        key_uniqueness_report)

    df = spark.createDataFrame(
        [(1, "a", None), (1, None, "a"),     # NULL-position conflict
         (2, "x", None), (2, "x", None),     # exact re-delivery w/ NULL
         (3, "y", "z")],                     # clean key
        "k int, c1 string, c2 string")
    got = {r["k"]: (r["n_rows"], r["n_distinct_payloads"])
           for r in key_uniqueness_report(df, ["k"]).collect()}
    assert got == {1: (2, 2), 2: (2, 1)}


# ---------------------------------------------------------------------------
# Axis 10 (r5): numeric extremes. NaN, +-Inf, -0.0, 1e150, the smallest
# subnormal (5e-324) and true NULLs (pyarrow-written so NaN and NULL stay
# distinct — pandas' to_parquet silently converts NaN to NULL) injected
# into events.value, lineitem prices/quantities, orders.o_totalprice and
# embedding vectors. This sweep found and the engine fixed: fround's
# BIGINT floor (NaN -> 0.0, |x| >= 2^63 clamps to Long.MAX), NaN counted
# in exact-quantile ranks, hi*0 NaN at integral ranks, NaN-poisoned
# moment aggregates (DuckDB stddev raises OutOfRangeException on any
# non-finite input), NaN centroid components parsed as SQL column names,
# and non-finite sums flagged as divergence by the rollup convergence
# tolerance. Engines genuinely agree (no guards needed) on: NaN grouping
# (one group, both engines), min/max/avg/sum propagation, comparisons
# (NaN > x true on both), and quantile interpolation through +-Inf.
# ---------------------------------------------------------------------------

_NAN, _INF = float("nan"), float("inf")


@pytest.fixture(scope="module")
def extremes_dir(tmp_path_factory):
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("sfextreme")
    ts = lambda s: np.datetime64(s, "us")  # noqa: E731

    # events: user 555 carries one row per extreme; user 556 puts +Inf
    # and -Inf into ONE (user, type, hour) group so every sum/avg over
    # it goes NaN.
    ev = pq.read_table(f"{base}/events.parquet")
    rows, eid = [], 9_000_000
    extremes = [_NAN, _INF, -_INF, -0.0, 1e150, 5e-324, None]
    types = ["view", "click", "purchase", "view", "click", "purchase",
             "view"]
    for i, (v, et) in enumerate(zip(extremes, types)):
        rows.append((eid, ts(f"2024-05-01T0{i}:15:00"), 555, et, v,
                     '{"k": %d}' % i))
        eid += 1
    rows += [(eid, ts("2024-05-02T10:00:00"), 556, "view", _INF, None),
             (eid + 1, ts("2024-05-02T10:30:00"), 556, "view", -_INF,
              None),
             (eid + 2, ts("2024-05-02T11:00:00"), 556, "purchase", 2.5,
              "{}")]
    crafted = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string())})
    pq.write_table(pa.concat_tables([ev, crafted.cast(ev.schema)]),
                   out / "events.parquet")

    # lineitem: order 7777777, one line per price extreme; one NaN and
    # one Inf quantity feed the exact/approx quantile family.
    li = pq.read_table(f"{base}/lineitem.parquet")
    lrows = pa.table({
        "l_orderkey": pa.array([7777777] * 6, pa.int64()),
        "l_partkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "l_suppkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "l_linenumber": pa.array([1, 2, 3, 4, 5, 6], pa.int32()),
        "l_quantity": pa.array([_NAN, _INF, 7.0, 3.0, 1.0, 2.0],
                               pa.float64()),
        "l_extendedprice": pa.array(
            [_INF, -_INF, _NAN, -0.0, 1e150, 5e-324], pa.float64()),
        "l_discount": pa.array([0.05] * 6, pa.float64()),
        "l_tax": pa.array([0.02] * 6, pa.float64()),
        "l_returnflag": pa.array(["A", "N", "R", "A", "N", "R"],
                                 pa.string()),
        "l_linestatus": pa.array(["F", "O", "F", "O", "F", "O"],
                                 pa.string()),
        "l_shipdate": pa.array([ts("1995-06-15T00:00:00")] * 6,
                               pa.timestamp("us"))})
    pq.write_table(pa.concat_tables([li, lrows.cast(li.schema)]),
                   out / "lineitem.parquet")

    # orders: parent for 7777777 (+Inf totalprice) plus a NaN-priced one.
    od = pq.read_table(f"{base}/orders.parquet")
    orows = pa.table({
        "o_orderkey": pa.array([7777777, 7777778], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderstatus": pa.array(["F", "O"], pa.string()),
        "o_totalprice": pa.array([_INF, _NAN], pa.float64()),
        "o_orderdate": pa.array([ts("1995-06-01T00:00:00"),
                                 ts("1996-02-01T00:00:00")],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["3-MEDIUM", "1-URGENT"],
                                    pa.string())})
    pq.write_table(pa.concat_tables([od, orows.cast(od.schema)]),
                   out / "orders.parquet")

    # embeddings: NaN vector, one-Inf-component vector, huge magnitude
    # (norm overflows to Inf), tiny magnitude (norm squared underflows
    # to 0), NaN-patched mix.
    em = pq.read_table(f"{base}/embeddings.parquet")
    dim = len(em.column("embedding")[0].as_py())

    def vec(fill, patch=None):
        v = [fill] * dim
        if patch is not None:
            v[0] = patch
        return v

    erows = pa.table({
        "vec_id": pa.array([9001, 9002, 9003, 9004, 9005], pa.int64()),
        "embedding": pa.array(
            [vec(_NAN), vec(0.5, _INF), vec(1e200), vec(1e-200),
             vec(0.25, _NAN)], pa.list_(pa.float32())),
        "label": pa.array([0, 1, 2, 0, 1], pa.int32())})
    pq.write_table(pa.concat_tables([em, erows.cast(em.schema)]),
                   out / "embeddings.parquet")

    for t in ["region", "nation", "customer", "supplier", "part",
              "documents"]:
        shutil.copy(f"{base}/{t}.parquet", out / f"{t}.parquet")
    return str(out)


EXTREME_QUERIES = [
    # events.value consumers
    "value_counts", "global_minmax", "salted_grouped_stats",
    "range_position", "window_first_last_ratio", "daily_event_gapfill",
    "grouped_hour_sum", "moving_average", "lag_lead_delta",
    "event_funnel", "sessionize_events", "mixture_sample_events",
    "retention_cohorts", "conversion_lag_native",
    "asof_join_latest_click", "range_join_click_count",
    "props_map_stats", "value_outliers_by_type",
    # lineitem / orders price consumers
    "price_quantiles", "quantity_quantiles_by_flag", "dispersion_stats",
    "flagship_grouped_agg", "minmax_scale_by_group",
    "grouping_sets_agg", "sql_region_revenue",
    "tpch_q1_pricing_summary", "tpch_q6_forecast_revenue",
    "snapshot_diff_orders", "table_profile_orders",
    # embeddings
    "knn_brute_force", "embedding_neardup_topk", "label_centroid_norms",
    "embedding_norm_stats", "array_mean", "array_transform_norm",
    "array_size", "array_element_extract",
]


@pytest.mark.parametrize("name", EXTREME_QUERIES)
def test_numeric_extremes_parity(spark, extremes_dir, name):
    """Every numeric-consuming family stays value-exact against the
    oracle when NaN/+-Inf/-0.0/1e150/subnormal/NULL values appear in the
    measures. (The full 22-query TPC-H suite and the rollup-convergence
    hook were additionally verified hash-identical on this corpus via
    driver_sim during round 5; the scan-agg representatives q1/q6 stay
    in the committed sweep.)"""
    from data_pipelines_course_spark.queries import all_oracles, all_queries

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{extremes_dir}/{t}.parquet'")
        sp = all_queries()[name](spark, extremes_dir).toPandas()
        du = con.sql(all_oracles()[name]).df()
    finally:
        con.close()
    assert len(sp) == len(du), (len(sp), len(du))
    assert sorted(sp.columns) == sorted(du.columns)
    a, b = _norm(sp), _norm(du)
    if not a.equals(b):
        neq = (a != b)
        bad = {c: int(neq[c].sum()) for c in a.columns if neq[c].any()}
        raise AssertionError(
            f"{name}: value mismatch in {bad};\n"
            f"spark: {a[neq.any(axis=1)].head(3).to_dict('records')}\n"
            f"duck:  {b[neq.any(axis=1)].head(3).to_dict('records')}")


def test_inf_values_reported_as_outliers(spark, extremes_dir):
    """The semantic point of the finite-stats rework: a +-Inf value is
    REPORTED as the outlier it is (zscore +-Inf), instead of NaN-
    poisoning its whole event_type's sigma and silencing the gate; NaN
    values (no orderable score) are excluded."""
    from data_pipelines_course_spark.queries import all_queries

    out = (all_queries()["value_outliers_by_type"](spark, extremes_dir)
           .toPandas())
    by_event = dict(zip(out["event_id"], out["zscore"]))
    assert by_event.get(9000001) == _INF       # +Inf click
    assert by_event.get(9000002) == -_INF      # -Inf purchase
    assert 9000000 not in by_event             # NaN view: no score
    assert not out["zscore"].map(
        lambda z: z != z).any()                # no NaN scores anywhere


def test_known_quiet_side_pins_min_watermark(spark, tmp_path):
    """Documented operational hazard #4 (found by fuzz v11 probes
    J7/J8, re-confirmed by v12 probe O-G; promoted to a pin per the
    r10 verdict): in a multi-watermark query Spark's default
    `multipleWatermarkPolicy = min` takes the GLOBAL watermark as the
    MIN across sources, so a stream-stream join whose one side is
    QUIET pins the global watermark at epoch — the busy side's state
    is NEVER evicted (unbounded growth) and a left-outer join emits NO
    null-extended rows however stale its unmatched rows get. Pinned
    with the REGISTERED operator (`interval_join_view_clicks`,
    how=left_outer): views flow, clicks never arrive; the final
    progress must show the epoch watermark and ALL view rows still in
    state, and the sink must stay empty. If Spark's policy default or
    eviction coupling ever changes, this fails and the v11/v12 fuzz
    oracles must be re-probed."""
    import os
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    from data_pipelines_course_spark.streaming.jobs import (
        interval_join_view_clicks,
    )

    d = str(tmp_path / "feed")
    os.makedirs(d)
    t0 = _time.time() - 3600
    S = 1_000_000
    for b, ts in enumerate((100 * S, 5000 * S)):  # views 100s, 5000s apart
        p = os.path.join(d, f"b{b:03d}.parquet")
        pd.DataFrame({"ts_us": [ts], "event_id": [b], "user_id": [1],
                      "event_type": ["view"]}).to_parquet(p, index=False)
        os.utime(p, (t0 + b * 10, t0 + b * 10))

    def side(kind):
        return (spark.readStream
                .schema("ts_us long, event_id long, user_id long,"
                        " event_type string")
                .option("maxFilesPerTrigger", 1).parquet(d)
                .filter(F.col("event_type") == kind)
                .withColumn("ts", F.timestamp_micros("ts_us")))

    res = interval_join_view_clicks(side("view"), side("click"),
                                    horizon="10 minutes",
                                    watermark="0 seconds",
                                    how="left_outer")
    q = (res.writeStream.format("memory")
         .queryName("quiet_side_pin").outputMode("append")
         .trigger(availableNow=True).start())
    try:
        assert q.awaitTermination(300)
        prog = q.lastProgress
    finally:
        q.stop()
    # view 0 is 49+ minutes past its 10-minute horizon at the final
    # batch, yet: no null-extended emission (sink empty), watermark
    # pinned at epoch by the click side, both views still in state.
    assert spark.table("quiet_side_pin").count() == 0
    assert prog["eventTime"]["watermark"].startswith("1970-01-01T00:00:00")
    assert prog["stateOperators"][0]["numRowsTotal"] == 2
