"""Hypothesis property tests over the engine's composite operators —
SURVEY §5.2's strategy-refinement style (Chapter 7 - Testing with
Hypothesis.ipynb) applied beyond the scalar layer: instead of pinned
corpora, each property drives a Spark operator with generated inputs and
checks it against an independent pure-Python reference implementation
(union-find, backward-scan as-of, IEEE double arithmetic). Shrunk
counterexamples become frozen regression rows the way the reference
notebook freezes its two shrunk floats.

Cost discipline: the session-scoped spark fixture is reused, example
counts are small (each example is a real Spark job), and deadlines are
off — Spark job latency is scheduling noise, not a property failure.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_pipelines_course_spark.functions.scalar import (
    fround, fround_portable_sql, fround_sql,
)

# ---------------------------------------------------------------------------
# fround: the one rounding primitive nearly every oracle-backed query
# funnels doubles through. Three-way equivalence on HOSTILE floats
# (NaN, ±Inf, ±0.0, subnormals, >2^53 magnitudes — the numeric-extremes
# axis found the bigint-floor corruption here in r5): the Column form,
# the portable SQL text (runs verbatim on Spark), and DuckDB evaluating
# both SQL forms must agree bit-for-bit.
# ---------------------------------------------------------------------------

_HOSTILE_FLOATS = st.one_of(
    st.floats(allow_nan=True, allow_infinity=True),          # full range
    st.floats(min_value=-1e4, max_value=1e4),                # common case
    st.sampled_from([float("nan"), float("inf"), float("-inf"),
                     -0.0, 0.0, 5e-324, 2.0**53, -(2.0**53),
                     2.0**63, 1e150, 0.125, 2.675]),
)


def _same_double(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    return a == b or (a == 0.0 and b == 0.0)  # -0.0 vs +0.0 folds


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(x=_HOSTILE_FLOATS, n=st.sampled_from([2, 3, 4, 6]))
def test_fround_three_forms_agree_on_hostile_floats(spark, x, n):
    row = (spark.createDataFrame([(x,)], "x double")
           .select(fround(F.col("x"), n).alias("a"),
                   F.expr(fround_portable_sql("x", n)).alias("b"))
           .head())
    import duckdb

    d = duckdb.execute(
        f"SELECT {fround_sql('x', n)} AS a, "
        f"{fround_portable_sql('x', n)} AS b "
        f"FROM (SELECT CAST(? AS DOUBLE) AS x)", [x]).fetchone()
    assert _same_double(row["a"], row["b"]), (x, n, row)
    assert _same_double(d[0], d[1]), (x, n, d)
    assert _same_double(row["a"], d[0]), (x, n, row, d)


# ---------------------------------------------------------------------------
# asof_join vs a backward-scan reference: for every generated left row
# the window-carry implementation must attach exactly the right row a
# naive per-row scan picks — including the strict/non-strict equal-ts
# boundary and the documented greatest-struct tie-break for right rows
# sharing (key, ts).
# ---------------------------------------------------------------------------

_LEFT_ROWS = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 12)),
    min_size=1, max_size=8)
_RIGHT_ROWS = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 12), st.integers(0, 9)),
    min_size=0, max_size=8)


def _asof_reference(left, right, strict):
    out = []
    for k, lts in left:
        cands = [(rts, p) for (rk, rts, p) in right
                 if rk == k and (rts < lts if strict else rts <= lts)]
        best = max(cands) if cands else None  # (rts, payload) == struct order
        out.append((k, lts, best[0] if best else None,
                    best[1] if best else None))
    return sorted(out)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(left=_LEFT_ROWS, right=_RIGHT_ROWS, strict=st.booleans())
def test_asof_join_matches_backward_scan_reference(spark, left, right, strict):
    from data_pipelines_course_spark.operators.temporal import asof_join

    ldf = spark.createDataFrame(left, "k long, ts long")
    rdf = spark.createDataFrame(
        right, "k long, ts long, p long") if right else \
        spark.createDataFrame([], "k long, ts long, p long")
    got = sorted(
        (r["k"], r["ts"], r["r_ts"], r["r_p"])
        for r in asof_join(ldf, rdf, on="k", strict=strict).collect())
    assert got == _asof_reference(left, right, strict)


# ---------------------------------------------------------------------------
# Connected components vs union-find: both distributed algorithms
# (min-label propagation and alternating two-star) must label every
# generated graph identically to a sequential union-find — cluster_id is
# the component minimum, every edge endpoint appears exactly once.
# Precondition mirrored from the pair generators: no self-loops (every
# dedup pair has doc1 < doc2).
# ---------------------------------------------------------------------------

_EDGES = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda e: e[0] != e[1]),
    min_size=1, max_size=14)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups = {}
    for node in parent:
        groups.setdefault(find(node), []).append(node)
    return {n: min(members) for members in groups.values() for n in members}


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges=_EDGES)
def test_cc_both_algorithms_match_union_find(spark, edges):
    from data_pipelines_course_spark.operators.graph import (
        connected_components, connected_components_twostar)

    expected = _union_find_components(edges)
    df = spark.createDataFrame(edges, "a long, b long")
    prop = {r["doc_id"]: r["cluster_id"]
            for r in connected_components(df, "a", "b").collect()}
    two = {r["doc_id"]: r["cluster_id"]
           for r in connected_components_twostar(df, "a", "b").collect()}
    assert prop == expected
    assert two == expected

# ---------------------------------------------------------------------------
# sessionize vs a sequential gap-scan: per-user (ts, event_id)-ordered
# run of events, new session when the gap STRICTLY exceeds the window.
# Generated timestamps deliberately collide (ties inside and across
# users) — the event_id tie-break must make the assignment a pure
# function of the row set, never of input order.
# ---------------------------------------------------------------------------

_EVENTS = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 300)),  # (user, seconds)
    min_size=1, max_size=12)


def _sessionize_reference(rows, gap_s):
    out = {}
    by_user = {}
    for eid, (u, s) in enumerate(rows):
        by_user.setdefault(u, []).append((s, eid))
    for u, evs in by_user.items():
        seq = 0
        prev = None
        for s, eid in sorted(evs):
            if prev is None or (s - prev) > gap_s:
                seq += 1
            out[eid] = (u, seq)
            prev = s
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=_EVENTS)
def test_sessionize_matches_gap_scan_reference(spark, rows):
    import datetime

    from data_pipelines_course_spark.operators.temporal import sessionize

    base = datetime.datetime(2024, 1, 1)
    data = [(u, eid, base + datetime.timedelta(seconds=s))
            for eid, (u, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "user_id long, event_id long, ts timestamp")
    got = {r["event_id"]: (r["user_id"], r["session_seq"])
           for r in sessionize(df, gap_minutes=1).collect()}
    assert got == _sessionize_reference(rows, gap_s=60)


# ---------------------------------------------------------------------------
# scd2_intervals vs a sequential run-length encoder, with NULL states in
# the generated stream. The break predicate is SQL three-valued logic:
# `lag IS NULL OR lag != et` — so a NULL state JOINS the preceding
# non-NULL run (lag != NULL is NULL -> no break) but always breaks the
# run AFTER it (lag IS NULL fires). The reference encodes exactly that
# contract; divergence here would also break the DuckDB oracle parity
# the adversarial NULL axis pins.
# ---------------------------------------------------------------------------

_STATE_EVENTS = st.lists(
    st.tuples(st.integers(0, 1),                      # user
              st.integers(0, 30),                     # seconds
              st.sampled_from(["a", "b", None])),     # state
    min_size=1, max_size=10)


def _scd2_reference(rows):
    by_user = {}
    for eid, (u, s, et) in enumerate(rows):
        by_user.setdefault(u, []).append((s, eid, et))
    out = []
    for u, evs in by_user.items():
        runs = []  # each: [states], [timestamps]
        prev_et, have_prev = None, False
        for s, eid, et in sorted(evs, key=lambda t: (t[0], t[1])):
            breaks = (not have_prev) or (prev_et is None) or (
                et is not None and et != prev_et)
            if breaks:
                runs.append(([et], [s]))
            else:
                runs[-1][0].append(et)
                runs[-1][1].append(s)
            prev_et, have_prev = et, True
        for i, (states, stamps) in enumerate(runs):
            non_null = [x for x in states if x is not None]
            nxt = runs[i + 1][1] if i + 1 < len(runs) else None
            out.append((u, i + 1,
                        min(non_null) if non_null else None,
                        min(stamps),
                        min(nxt) if nxt is not None else None,
                        nxt is None,
                        len(states)))
    return sorted(out)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=_STATE_EVENTS)
def test_scd2_intervals_match_run_length_reference(spark, rows):
    import datetime

    from data_pipelines_course_spark.operators.temporal import scd2_intervals

    base = datetime.datetime(2024, 1, 1)
    data = [(u, eid, base + datetime.timedelta(seconds=s), et)
            for eid, (u, s, et) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "user_id long, event_id long, ts timestamp, event_type string")
    got = sorted(
        (r["user_id"], r["run_seq"], r["state"],
         (r["valid_from"] - base).total_seconds(),
         (r["valid_to"] - base).total_seconds()
         if r["valid_to"] is not None else None,
         r["is_current"], r["n_events"])
        for r in scd2_intervals(df).collect())
    assert got == _scd2_reference(rows)

# ---------------------------------------------------------------------------
# banded_range_join (collapsed shape) vs a per-row scan: every right row
# with lts - window <= rts < lts must attach with exact multiplicity,
# unmatched left rows must emit exactly ONE all-null row (the r4 band-
# artifact bug class), and the band arithmetic must hold on PRE-EPOCH
# timestamps too (negative micros exercise the trunc-vs-floor banding).
# ---------------------------------------------------------------------------

_RANGE_LEFT = st.lists(
    st.tuples(st.integers(0, 1), st.integers(-60, 60)),   # (key, seconds)
    min_size=1, max_size=6)
_RANGE_RIGHT = st.lists(
    st.tuples(st.integers(0, 1), st.integers(-60, 60), st.integers(0, 9)),
    min_size=0, max_size=8)


def _range_reference(left, right, window_s):
    out = []
    for lid, (k, lts) in enumerate(left):
        matches = [(rts, p) for (rk, rts, p) in right
                   if rk == k and lts - window_s <= rts < lts]
        if matches:
            out.extend((lid, k, lts, rts, p) for rts, p in matches)
        else:
            out.append((lid, k, lts, None, None))
    return sorted(out, key=lambda t: tuple(-2**62 if v is None else v
                                           for v in t))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(left=_RANGE_LEFT, right=_RANGE_RIGHT,
       window_s=st.sampled_from([5, 17, 30]))
def test_banded_range_join_matches_scan_reference(spark, left, right, window_s):
    import datetime

    from data_pipelines_course_spark.operators.temporal import (
        banded_range_join,
    )

    epoch = datetime.datetime(1970, 1, 1)

    def ts(s):
        return epoch + datetime.timedelta(seconds=s)

    ldf = spark.createDataFrame(
        [(lid, k, ts(s)) for lid, (k, s) in enumerate(left)],
        "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(
        [(k, ts(s), p) for (k, s, p) in right] or [],
        "k long, ts timestamp, p long")
    got = banded_range_join(
        ldf, rdf, on="k", left_ts="ts", right_ts="ts",
        window_expr=F.expr(f"INTERVAL {window_s} SECONDS"),
        band_micros=window_s * 1_000_000, left_id="lid").collect()
    norm = sorted(
        ((r["lid"], r["k"], int((r["ts"] - epoch).total_seconds()),
          int((r["r_ts"] - epoch).total_seconds())
          if r["r_ts"] is not None else None,
          r["r_p"])
         for r in got),
        key=lambda t: tuple(-2**62 if v is None else v for v in t))
    assert norm == _range_reference(left, right, window_s)
