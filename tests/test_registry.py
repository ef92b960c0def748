"""Registry invariants: driver-rotation freshness and scale-twin pairing.

The verify driver records CORRECTNESS rows for the first 50 names of
``queries()``. These tests make the rotation machine-checkable so a new
query can't silently miss driver coverage, and make the deliberate
ground-truth↔scale-twin pairing (VERDICT r3 #4) auditable from the
registry itself instead of from docstrings.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from data_pipelines_course_spark import queries as Q

REPO = Path(__file__).resolve().parent.parent


def _driver_covered() -> set[str]:
    names: set[str] = set()
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        names |= set(json.loads(f.read_text()).keys())
    return names


def test_driver_first_is_exactly_the_uncovered_set():
    """DRIVER_FIRST must front-load precisely the registered queries that
    have no CORRECTNESS row in any committed driver file yet. When the
    next round's file lands and covers them, this test fails, forcing the
    rotation to advance — it cannot silently go stale."""
    Q.load_registry()
    registered = set(Q.QUERIES)
    uncovered = registered - _driver_covered()
    if not uncovered:
        # Full coverage achieved: the rotation's only remaining duty is
        # to not name queries that don't exist.
        assert set(Q.DRIVER_FIRST) <= registered
        return
    cap = 50
    front = set(Q.DRIVER_FIRST[: min(cap, len(Q.DRIVER_FIRST))])
    if len(uncovered) <= cap:
        if not front >= uncovered:
            # Self-healing failure mode: print the corrected front of
            # DRIVER_FIRST verbatim so the fix is a paste, not a thought.
            fixed = sorted(uncovered) + [
                n for n in Q.DRIVER_FIRST if n not in uncovered
            ]
            tup = "\n".join(f'    "{n}",' for n in fixed[:cap])
            raise AssertionError(
                "rotation stale: uncovered queries missing from DRIVER_FIRST "
                f"front-50: {sorted(uncovered - front)}\n"
                "Replace the front of DRIVER_FIRST in "
                "data_pipelines_course_spark/queries.py with:\n"
                f"DRIVER_FIRST = (\n{tup}\n    ...\n)"
            )
    else:
        # More uncovered than the cap: the front must at least be all-uncovered.
        assert front <= uncovered


def test_driver_first_names_exist_and_unique():
    Q.load_registry()
    assert len(Q.DRIVER_FIRST) == len(set(Q.DRIVER_FIRST))
    unknown = [n for n in Q.DRIVER_FIRST if n not in Q.QUERIES]
    assert not unknown, f"DRIVER_FIRST names not registered: {unknown}"


def test_all_queries_starts_with_driver_first():
    ordered = list(Q.all_queries())
    assert ordered[: len(Q.DRIVER_FIRST)] == list(Q.DRIVER_FIRST)


def test_ground_truth_queries_declare_scale_twins():
    """Every documented deliberate-ground-truth (quadratic / single-reducer)
    query must declare its registered scale twin via @query(scale_twin=...),
    and the twin must exist."""
    Q.load_registry()
    for name, twin in Q.SCALE_TWINS.items():
        assert name in Q.QUERIES, f"scale_twin declared on unknown query {name}"
        assert twin in Q.QUERIES, (
            f"{name} declares scale twin {twin!r} which is not registered"
        )
        assert twin != name
    # The six known deliberate weak queries (VERDICT r3) must all be tagged.
    expected = {
        "price_quantiles",
        "cogroup_conversion_lag",
        "ngram_jaccard_topk",
        "ngram_jaccard_threshold",
        "embedding_neardup_topk",
        "vocab_typo_pairs",
    }
    missing = expected - set(Q.SCALE_TWINS)
    assert not missing, f"ground-truth queries lacking scale_twin tag: {missing}"
