"""Golden-output lookalike fixtures (SURVEY §5.1/§5.2 item 4).

The reference froze golden outputs in notebook cells, but the raw blobs
are absent from the repo (`.MISSING_LARGE_BLOBS`: data/mvt.csv,
data/europarl_speech_text.txt). These generators synthesize lookalike
datasets whose *queried marginals equal the frozen values exactly*, so the
engine can assert the same numbers the notebooks printed:

- mvt (Chicago motor-vehicle thefts, FIXTURES.md F-4): row count 191,641
  (`Chapter 4 - First Steps with Dask.ipynb:487` output); per-DayOfWeek
  counts 27397/26791/27416/27319/29284/27118/26316 Monday=0..Sunday=6
  (`:563` output); Hour value_counts head 22→14745, 0→13212, 21→12434
  (`:609` output); dates span the 2001-2012 yearly divisions
  (`:377, :465` outputs).
- europarl (F-9): German parliamentary text where
  |contains 'Deutschland'| + |contains 'Merkel'| = 890 — the RDD multiset
  union count frozen at `Chapter 6 - Introduction to PySpark.ipynb:229`.

Scale note: generation is `spark.range` + pure column expressions (no
driver-side row list, no Python UDF) — the same pattern scales to any
fixture size; writing to disk is the caller's choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import configure

MVT_TOTAL = 191_641
# Monday=0 .. Sunday=6 (Python convention — the notebook's dd.DayOfWeek).
MVT_DOW_COUNTS = [27_397, 26_791, 27_416, 27_319, 29_284, 27_118, 26_316]
# The three frozen head entries of Hour.value_counts(); the remaining
# 151,250 rows are spread over the other 21 hours strictly below 12,434 so
# the head stays exactly these three.
MVT_HOUR_HEAD = {22: 14_745, 0: 13_212, 21: 12_434}

EUROPARL_DE_ONLY = 400     # lines mentioning Deutschland but not Merkel
EUROPARL_MERKEL_ONLY = 430 # lines mentioning Merkel but not Deutschland
EUROPARL_BOTH = 30         # lines mentioning both (counted twice by union)
EUROPARL_FILLER = 2_140    # lines mentioning neither
# (400+30) + (430+30) = 890 — the frozen union count.


def _mvt_hour_counts() -> list[int]:
    """Exact per-hour counts: pin the frozen top-3, spread the remainder
    evenly (deterministically) over the other 21 hours, all < 12,434."""
    counts = [0] * 24
    for h, c in MVT_HOUR_HEAD.items():
        counts[h] = c
    rest = MVT_TOTAL - sum(MVT_HOUR_HEAD.values())
    others = [h for h in range(24) if h not in MVT_HOUR_HEAD]
    base, extra = divmod(rest, len(others))
    for i, h in enumerate(sorted(others)):
        counts[h] = base + (1 if i < extra else 0)
    assert sum(counts) == MVT_TOTAL
    assert all(counts[h] < min(MVT_HOUR_HEAD.values())
               for h in others)
    return counts


def _cum_lookup(id_col, counts: list[int], offset_expr=None):
    """CASE chain mapping a dense id in [0, sum(counts)) to its bucket by
    cumulative boundaries — pure codegen, no join, no UDF."""
    idx = id_col if offset_expr is None else offset_expr
    expr = F.lit(len(counts) - 1)
    cum = 0
    branches = []
    for b, c in enumerate(counts):
        cum += c
        branches.append((b, cum))
    # build when-chain from the first boundary up
    out = None
    for b, cum_b in branches:
        cond = idx < F.lit(cum_b)
        out = F.when(cond, F.lit(b)) if out is None else out.when(cond, F.lit(b))
    return F.coalesce(out, expr)


def mvt_lookalike(spark: SparkSession) -> DataFrame:
    """F-4 mvt rows in their RAW shape: `date_raw` string `M/d/yy H:mm`
    plus lat/lon — the datetime parts must be DERIVED by the engine's
    F9/F10 operators, exactly as the notebook derives them from the CSV.

    Weekday is realized as a real calendar date (2001-01-01 is a Monday;
    date = that Monday + 7*week + dow), so the engine's weekday derivation
    must agree with the generator's intent — the test asserts the frozen
    per-DayOfWeek counts against *derived* columns, not generator labels.
    Hour and weekday are decorrelated by a modular bijection on the row id
    (multiplier 100003 is prime and does not divide 191,641).
    """
    configure(spark)
    hour_counts = _mvt_hour_counts()
    df = spark.range(MVT_TOTAL).repartition(32)
    permuted = (F.col("id") * F.lit(100_003)) % F.lit(MVT_TOTAL)
    df = df.select(
        F.col("id"),
        _cum_lookup(F.col("id"), hour_counts).alias("hour_gen"),
        _cum_lookup(None, MVT_DOW_COUNTS, offset_expr=permuted).alias("dow_gen"),
    )
    # 624 weeks from 2001-01-01 keeps every date inside the frozen
    # 2001..2012 division range (2001-01-01 + 623*7 + 6 = 2012-12-17).
    date = F.date_add(
        F.to_date(F.lit("2001-01-01")),
        ((F.col("id") % F.lit(624)) * F.lit(7)
         + F.col("dow_gen")).cast("int"))
    return df.select(
        F.concat_ws(
            " ",
            F.date_format(date, "M/d/yy"),
            F.format_string("%d:%02d", F.col("hour_gen"),
                            (F.col("id") % F.lit(60)).cast("int")),
        ).alias("date_raw"),
        (F.lit(41.8) + (F.col("id") % 1000) / F.lit(10_000.0)).alias("latitude"),
        (F.lit(-87.7) - (F.col("id") % 1000) / F.lit(10_000.0)).alias("longitude"),
    )


def europarl_lookalike(spark: SparkSession) -> DataFrame:
    """F-9 europarl speech lines with controlled keyword frequencies:
    430 lines contain 'Deutschland', 460 contain 'Merkel', 30 contain
    both, so filter+filter+union (dups kept — RDD/bag multiset union,
    SURVEY J3) counts exactly 890."""
    configure(spark)
    n = EUROPARL_DE_ONLY + EUROPARL_MERKEL_ONLY + EUROPARL_BOTH + EUROPARL_FILLER
    df = spark.range(n).repartition(8)
    i = F.col("id")
    de_end = EUROPARL_DE_ONLY
    me_end = de_end + EUROPARL_MERKEL_ONLY
    both_end = me_end + EUROPARL_BOTH
    line = (
        F.when(i < de_end,
               F.format_string("Rede %d über Deutschland und Europa", i))
        .when(i < me_end,
              F.format_string("Rede %d der Bundeskanzlerin Merkel", i))
        .when(i < both_end,
              F.format_string("Rede %d von Merkel über Deutschland", i))
        .otherwise(F.format_string("Rede %d zur europäischen Politik", i))
    )
    return df.select(line.alias("value"))
