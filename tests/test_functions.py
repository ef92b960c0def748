"""Scalar/expression-layer tests (SURVEY §5.2 item 3): the calc_ratio
Hypothesis property ported from the reference (Chapter 7 - Testing with
Hypothesis.ipynb — bounded floats, ≤2 decimals), run THROUGH Spark
(createDataFrame → expr → collect) so our expressions are under test, not
Python's arithmetic; plus weekday-convention, repr-list-adapter and
fround determinism checks."""

from __future__ import annotations

import datetime
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row, functions as F

from data_pipelines_course_spark.functions.scalar import (
    calc_ratio, fround, iso_format, parse_repr_list, weekday_py,
)

# The reference's refined strategy: floats(min_value=4) then
# max_value=10000 (Hypothesis.ipynb:89, :310). One shared Spark job per
# example would be slow — batch examples through one DataFrame instead.


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(price=st.floats(min_value=4, max_value=10000),
       compare=st.floats(min_value=4, max_value=10000))
def test_calc_ratio_properties(spark, price, compare):
    row = (spark.createDataFrame([Row(p=price, c=compare)])
           .select(calc_ratio(F.col("p"), F.col("c")).alias("r"))
           .head())
    r = row["r"]
    # Property 1 (reference): result is a float.
    assert isinstance(r, float)
    # Property 2 (reference): ≤ 2 decimal places after rounding.
    assert r == round(r * 100) / 100 or math.isclose(
        r, round(r * 100) / 100, rel_tol=1e-12)
    # Property 3: matches the pure-python formula within rounding.
    expected = ((price / compare) - 1) * 100
    assert abs(r - expected) <= 0.005 + 1e-9 * abs(expected)


def test_calc_ratio_documented_counterexamples(spark):
    """The two shrunk failures the reference froze
    (Hypothesis.ipynb:226, :299) must be handled, not crash."""
    df = spark.createDataFrame(
        [Row(p=8.000200000000001, c=4.0), Row(p=400000000000004.0, c=4.0)])
    rows = df.select(calc_ratio(F.col("p"), F.col("c")).alias("r")).collect()
    assert rows[0]["r"] == 100.01  # (8.0002/4 - 1)*100 = 100.005 → 100.01
    assert rows[1]["r"] > 0


def test_weekday_python_convention(spark):
    """F10 ⚠ — Monday must be 0 (python d.weekday()), not Spark's
    dayofweek Sunday=1."""
    days = [datetime.date(2024, 1, d) for d in range(1, 8)]  # Mon 1 Jan 24
    df = spark.createDataFrame([Row(d=d) for d in days])
    got = [r[0] for r in
           df.select(weekday_py(F.col("d"))).collect()]
    expected = [d.weekday() for d in days]
    assert got == expected == [0, 1, 2, 3, 4, 5, 6]


def test_iso_format_matches_python_isoformat(spark):
    ts = datetime.datetime(2024, 3, 5, 14, 30, 9)
    df = spark.createDataFrame([Row(t=ts)])
    got = df.select(iso_format(F.col("t")).alias("s")).head()["s"]
    assert got == ts.isoformat() == "2024-03-05T14:30:09"


def test_parse_repr_list_adapter(spark):
    """F18 — legacy repr() lists (the reference's ast.literal_eval shape,
    airflow/dags/twitter_airflow.py:136) parse into real arrays."""
    df = spark.createDataFrame([
        Row(urls="['http://a.example/x', 'http://b.example/y']"),
        Row(urls="[]"),
    ])
    rows = df.select(parse_repr_list(F.col("urls")).alias("u")).collect()
    assert rows[0]["u"] == ["http://a.example/x", "http://b.example/y"]
    assert rows[1]["u"] == []


def test_fround_boundary_determinism(spark):
    """The motivating case: 34.285 is stored as 34.28499999999999803…;
    fround must give 34.28 (binary-value rounding, like DuckDB/C), while
    Spark's native round gives 34.29 (shortest-repr rounding)."""
    df = spark.createDataFrame([Row(x=34.285)])
    got = df.select(
        fround(F.col("x"), 2).alias("f"),
        F.round(F.col("x"), 2).alias("native"),
    ).head()
    assert got["f"] == 34.28
    assert got["native"] == 34.29  # documents the engine disagreement


def test_approx_quantiles_within_documented_error(spark):
    """The 100 TB scale path for price_quantiles is itself a REGISTERED
    query (price_quantiles_approx, rows-only driver check): its sketch
    values must land within 1% relative error of the exact registered
    twin at sf0.01 — the bound a user accepts when they flip the
    switch — and the two must share a schema so the swap is drop-in."""
    from data_pipelines_course_spark.queries import all_queries

    queries = all_queries()
    sf = "/root/testdata/sf0.01"
    exact = queries["price_quantiles"](spark, sf)
    approx = queries["price_quantiles_approx"](spark, sf)
    assert approx.columns == exact.columns  # drop-in swap
    e, a = exact.first(), approx.first()
    for col in exact.columns:
        rel = abs(a[col] - e[col]) / e[col]
        assert rel < 0.01, (col, e[col], a[col])


def test_approx_quantiles_single_sketch_matches_per_quantile_aggs(spark):
    """r12 optimization pin: the registered query builds ONE
    percentile_approx sketch with an array of percentages; the original
    form ran four independent single-percentage aggregates. Same
    values, same order, same accuracy ⇒ identical sketch state, so the
    two forms must agree bit-for-bit — this is what licenses the 4x
    per-row work reduction without touching the rows-only contract."""
    from pyspark.sql import functions as F

    from data_pipelines_course_spark.datasets import load
    from data_pipelines_course_spark.queries import all_queries

    sf = "/root/testdata/sf0.01"
    got = all_queries()["price_quantiles_approx"](spark, sf).first()
    li = load(spark, sf, "lineitem")
    old = li.agg(*[
        F.expr(f"percentile_approx(l_extendedprice, {q}, 10000)")
        .alias(f"q{int(q * 100)}")
        for q in (0.25, 0.5, 0.75, 0.95)]).first()
    for col in ("q25", "q50", "q75", "q95"):
        assert got[col] == old[col], (col, got[col], old[col])


def test_vocab_typo_logic_on_planted_typos(spark):
    """The corpus vocabulary happens to contain no edit-distance-1
    frequency-skewed pairs (the registered query legitimately returns 0
    rows there), so prove the blocking + levenshtein + skew logic on
    planted data: 'table' x200 vs 'tabel' x3 must pair; equal-frequency
    variants and distance-2 words must not."""
    from pyspark.sql import functions as F

    # 'tabl' sorts BEFORE 'table' — the case a lexicographic pair
    # orientation silently drops (caught by this test; the operator now
    # orients by frequency). 'tabel' would NOT pair: transposition is
    # Levenshtein distance 2 (Damerau would be 1).
    rows = ([("table",)] * 200 + [("tabl",)] * 3
            + [("scan",)] * 50 + [("scam",)] * 50      # equal-ish freq
            + [("merge",)] * 80 + [("marble",)] * 2)   # distance 2
    docs = spark.createDataFrame(
        [(i, " ".join(w for (w,) in rows))
         for i in range(1)], "doc_id long, text string")
    # reuse the registered query's internals by running the same shape
    vocab = (docs.select(F.explode(F.split(F.lower(F.trim("text")),
                                           r"\s+")).alias("token"))
             .groupBy("token")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    a, b = vocab.alias("a"), vocab.alias("b")
    pairs = (a.join(
                 b,
                 (F.expr("substring(a.token, 1, 1)")
                  == F.expr("substring(b.token, 1, 1)"))
                 & (F.abs(F.length("a.token") - F.length("b.token")) <= 1)
                 & (F.col("a.token") != F.col("b.token"))
                 & (F.levenshtein("a.token", "b.token") == 1))
             .filter(F.col("a.n") >= 10 * F.col("b.n"))
             .select(F.col("a.token").alias("token"),
                     F.col("b.token").alias("variant")))
    got = {(r["token"], r["variant"]) for r in pairs.collect()}
    assert got == {("table", "tabl")}, got


def test_symspell_typo_candidates_catch_first_letter_typos(spark):
    """The deletion-neighborhood join must find distance-1 pairs the
    first-char-blocked variant structurally cannot: 'able' (deletion of
    the FIRST letter of a common 'table') pairs here."""
    from pyspark.sql import functions as F

    text = " ".join(["table"] * 200 + ["able"] * 3 + ["chair"] * 40)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    vocab = (docs.select(F.explode(F.split(F.lower(F.trim("text")),
                                           r"\s+")).alias("token"))
             .groupBy("token")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    keys = vocab.select(
        "token", "n",
        F.explode(F.expr(
            "concat(array(token), transform(sequence(1, length(token)),"
            " i -> concat(substring(token, 1, i - 1),"
            " substring(token, i + 1, length(token)))))")).alias("k"))
    a = keys.select(F.col("token").alias("a_token"),
                    F.col("n").alias("a_n"), F.xxhash64("k").alias("kh"))
    b = keys.select(F.col("token").alias("b_token"),
                    F.col("n").alias("b_n"), F.xxhash64("k").alias("kh"))
    got = {(r["a_token"], r["b_token"]) for r in
           (a.join(b, "kh")
            .filter(F.col("a_token") != F.col("b_token"))
            .select("a_token", "a_n", "b_token", "b_n").distinct()
            .filter((F.levenshtein("a_token", "b_token") == 1)
                    & (F.col("a_n") >= 10 * F.col("b_n")))
            .collect())}
    assert got == {("table", "able")}, got


def test_exact_quantiles_matches_duckdb_on_random_inputs(spark):
    """Property check for the distributed rank-based exact quantile: on
    adversarial value sets (duplicates, negatives, huge spread, tiny n,
    n straddling partition counts) the result is bit-identical to DuckDB
    quantile_cont — including the interpolation arithmetic, not just the
    order statistics."""
    import duckdb
    import random

    from data_pipelines_course_spark.operators.analytics import (
        exact_quantiles)

    rng = random.Random(7)
    cases = [
        [1.0],                                   # single value
        [2.0, 2.0, 2.0, 2.0],                    # all ties
        [float(i) for i in range(11)],           # exact grid hits
        [rng.uniform(-1e9, 1e9) for _ in range(997)],   # prime n
        [rng.choice([0.1, 0.2, 0.3]) for _ in range(256)],  # heavy dupes
        [rng.gauss(0, 1) * 10 ** rng.randint(-6, 6)
         for _ in range(500)],                   # wild magnitudes
    ]
    qs = (0.25, 0.5, 0.75, 0.95)
    con = duckdb.connect()
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = exact_quantiles(df, "x", qs)
        import pandas as pd

        tdf = pd.DataFrame({"x": vals})  # float64 — VALUES literals
        con.register("t", tdf)           # would parse as DECIMAL
        want = con.sql(
            "SELECT " + ",".join(
                f"quantile_cont(x, {q})" for q in qs) + " FROM t"
        ).fetchone()
        for q, w in zip(qs, want):
            assert got[q] == w, (len(vals), q, got[q], w)


def test_grouped_approx_quantiles_within_documented_error(spark):
    """Same contract for the GROUPED pair: the per-group sketch twin
    must land within 1% relative error of the exact
    quantity_quantiles_by_flag for every group, with a drop-in schema."""
    from data_pipelines_course_spark.queries import all_queries

    queries = all_queries()
    sf = "/root/testdata/sf0.01"
    exact = {r["l_returnflag"]: r for r in
             queries["quantity_quantiles_by_flag"](spark, sf).collect()}
    approx_df = queries["quantity_quantiles_by_flag_approx"](spark, sf)
    assert approx_df.columns == \
        queries["quantity_quantiles_by_flag"](spark, sf).columns
    approx = {r["l_returnflag"]: r for r in approx_df.collect()}
    assert set(approx) == set(exact)
    for flag, e in exact.items():
        for col in ("median_qty", "p90_qty"):
            rel = abs(approx[flag][col] - e[col]) / e[col]
            assert rel < 0.01, (flag, col, e[col], approx[flag][col])
