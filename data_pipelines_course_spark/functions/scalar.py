"""Scalar expression helpers — SURVEY §2.8 compatibility shims and the
engine's cross-engine-deterministic rounding.

Rounding (F13 ⚠, SURVEY §7 hard parts): Spark's round() on DoubleType goes
through java.math.BigDecimal.valueOf — it rounds the SHORTEST DECIMAL
REPRESENTATION ("34.285" → 34.29 HALF_UP) — while DuckDB/C engines round
the binary value (34.284999999999997 → 34.28). The two disagree whenever a
result lands on a representation boundary. `fround` instead uses pure
double arithmetic, floor(x·10ⁿ + 0.5)/10ⁿ, which evaluates bit-identically
on every engine; `fround_sql` is the matching DuckDB/ANSI spelling.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

__all__ = [
    "fround", "fround_sql", "weekday_py", "calc_ratio", "iso_format",
    "parse_repr_list",
]


def fround(col: Column, n: int = 2) -> Column:
    """Deterministic half-up-via-floor rounding on doubles (see module
    docstring). Spark's floor() on a double returns BIGINT — correct and
    -0.0-free for |x·10ⁿ| < 2⁵³, but it silently maps NaN → 0 and clamps
    anything ≥ 2⁶³ to Long.MAX (numeric-extremes sweep, r5). DuckDB's
    floor stays in double space (NaN → NaN, 1e152 → 1e152), so the
    bigint path is used only where it is exact; beyond 2⁵³ every double
    is already integral and identity IS floor, which also passes NaN and
    ±Inf through unchanged — bit-identical to the oracle's floor."""
    scale = 10 ** n
    y = col * F.lit(scale) + F.lit(0.5)
    floored = F.when(F.abs(y) < F.lit(float(2 ** 53)),
                     F.floor(y).cast("double")).otherwise(y)
    return floored / F.lit(scale)


def fround_sql(expr: str, n: int = 2) -> str:
    """DuckDB/ANSI equivalent of :func:`fround` (same double arithmetic).
    DuckDB's floor stays in double space, so no guard is needed — use
    this ONLY for oracle strings. SQL text that also runs through
    spark.sql needs :func:`fround_portable_sql`."""
    scale = 10 ** n
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def fround_portable_sql(expr: str, n: int = 2) -> str:
    """fround as SQL text with IDENTICAL semantics on Spark and DuckDB —
    for query strings that run verbatim on both engines. Spark's floor
    returns BIGINT (NaN -> 0, |x| >= 2^63 clamps to Long.MAX), so the
    bigint floor is used only in its exact range; beyond 2^53 doubles
    are already integral and identity IS floor, and NaN/Inf fall
    through unchanged. On DuckDB the CASE is a semantic no-op (its
    floor already behaves this way)."""
    scale = 10 ** n
    y = f"(({expr}) * {scale} + 0.5)"
    return (f"(CASE WHEN abs({y}) < 9007199254740992.0 "
            f"THEN CAST(floor({y}) AS DOUBLE) ELSE {y} END / {scale})")


def weekday_py(col: str | Column) -> Column:
    """Day-of-week with PYTHON semantics Monday=0 (F10 ⚠ — reference uses
    d.weekday() at Extras...ipynb:129; Spark's dayofweek() is Sunday=1).
    Spark ≥3.5 weekday() matches Python directly."""
    return F.weekday(col)


def calc_ratio(price: Column, compare: Column) -> Column:
    """Percent ratio ((price/compare) - 1) * 100, rounded 2dp — the
    Hypothesis-tested pure function of the reference
    (celery_app/tasks.py:35-43; properties in Chapter 7 - Testing with
    Hypothesis.ipynb). Division by zero yields NULL (Spark semantics),
    matching the reference's refined strategy floats(min_value=4) which
    excludes zero denominators."""
    return fround((price / compare - 1) * 100, 2)


def iso_format(col: str | Column) -> Column:
    """ISO-8601 second-precision text (F11 — created_at.isoformat(),
    airflow/dags/twitter_airflow.py:49)."""
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss")


def parse_repr_list(col: str | Column) -> Column:
    """Adapter for legacy stringified Python lists (F18 — the reference
    stores repr(['url', ...]) in SQLite and re-parses with
    ast.literal_eval, airflow/dags/twitter_airflow.py:136). We translate
    the repr form to JSON (quote swap) and parse with from_json — the
    design fix is to never store repr() again, but ingest must read it."""
    json_ish = F.regexp_replace(col, r"'", '"')
    return F.from_json(json_ish, T.ArrayType(T.StringType()))
