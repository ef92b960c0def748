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


def _driver_latest_round(skip_round: int | None = None) -> dict[str, int]:
    """name -> most recent round with a committed driver CORRECTNESS row."""
    latest: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(f.stem.split("_r")[1])
        if rnd == skip_round:
            continue
        for name in json.loads(f.read_text()):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _stalest(registered: set[str], latest: dict[str, int],
             cap: int = 50) -> list[str]:
    # Never-covered names rank at round 0 — automatically first.
    ranked = sorted(registered, key=lambda n: (latest.get(n, 0), n))
    return ranked[: min(cap, len(ranked))]


def test_driver_first_is_the_staleness_ratchet():
    """The rotation is a staleness ratchet (VERDICT r6 #1).

    Queries with NO driver row ever take absolute priority (a new
    registration must get its first row next round). With coverage
    complete, the front-50 must be exactly the 50 registered names
    whose most recent driver row is OLDEST, ranked by
    (latest round, name) — so every query re-records on a ≤4-round
    cycle.

    One round of grace, no more: the verify driver lands the round's
    CORRECTNESS file BEFORE the judge's pytest run, which shifts the
    ranking while the rotation legitimately still reflects the state it
    was set from. So the front may match the stalest-set computed
    either from ALL committed files, or from all files MINUS the newest
    one (the just-recorded round). If a round's rotation is ever
    skipped, the next recorded file makes BOTH rankings diverge from
    the front and the suite goes red with a paste-ready tuple — the
    rotation cannot silently go stale."""
    Q.load_registry()
    registered = set(Q.QUERIES)
    rounds = sorted(int(f.stem.split("_r")[1])
                    for f in REPO.glob("CORRECTNESS_r*.json"))
    newest = rounds[-1] if rounds else None
    want_now = _stalest(registered, _driver_latest_round())
    want_prev = _stalest(registered, _driver_latest_round(skip_round=newest))
    front = list(Q.DRIVER_FIRST[: min(50, len(Q.DRIVER_FIRST))])
    if set(front) not in (set(want_now), set(want_prev)):
        # Self-healing failure mode: print the corrected front of
        # DRIVER_FIRST verbatim so the fix is a paste, not a thought.
        tup = "\n".join(f'    "{n}",' for n in want_now)
        raise AssertionError(
            "rotation stale: front-50 is not the 50 stalest names "
            "(neither including nor excluding the newest CORRECTNESS "
            "file).\n"
            f"missing from front: {sorted(set(want_now) - set(front))}\n"
            f"should not be in front: {sorted(set(front) - set(want_now))}\n"
            "Replace DRIVER_FIRST in "
            "data_pipelines_course_spark/queries.py with:\n"
            f"DRIVER_FIRST = (\n{tup}\n)"
        )


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
